#!/usr/bin/env python
"""Batch subset-manifest creation from a YAML plan, sequentially.

Parity with UALM/tools/object_storage_manifest/batch_create_subset_manifest.py:
validate every dataset's inputs up front, print the execution plan, run
``create_subset_manifest`` per dataset in order, and report a
success/failure summary (the reference shells out to the single-dataset
script; this calls the library function directly — same contract).

Config YAML:
  datasets:
    - name: musiccaps_v2
      input_manifest: filters/musiccaps.jsonl
      source_manifest_dir: shards/musiccaps/
      output_dir: subsets/musiccaps_v2/
      prefix: train                 # optional (default train)
      update_metadata: true         # optional (default true)
      dataset_name: musiccaps_v2    # optional row stamp

Usage:
  python cli/batch_create_subset_manifest.py --config plan.yaml [--dry_run]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclass
class DatasetConfig:
    name: str
    input_manifest: str
    source_manifest_dir: str
    output_dir: str
    prefix: str = "train"
    update_metadata: bool = True
    dataset_name: Optional[str] = None

    def validate(self) -> List[str]:
        errs = []
        if not Path(self.input_manifest).exists():
            errs.append(
                f"{self.name}: input manifest not found: {self.input_manifest}"
            )
        if not Path(self.source_manifest_dir).is_dir():
            errs.append(
                f"{self.name}: source manifest dir not found: "
                f"{self.source_manifest_dir}"
            )
        return errs


def load_config(path: str) -> List[DatasetConfig]:
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    out = []
    for ds in doc.get("datasets", []):
        out.append(
            DatasetConfig(
                name=ds["name"],
                input_manifest=ds["input_manifest"],
                source_manifest_dir=ds["source_manifest_dir"],
                output_dir=ds["output_dir"],
                prefix=ds.get("prefix", "train"),
                update_metadata=ds.get("update_metadata", True),
                dataset_name=ds.get("dataset_name"),
            )
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--dry_run", action="store_true",
                   help="validate + print the plan, run nothing")
    args = p.parse_args(argv)

    datasets = load_config(args.config)
    if not datasets:
        print("no datasets in config")
        return 1

    errors = [e for ds in datasets for e in ds.validate()]
    print(f"=== plan: {len(datasets)} dataset(s) ===")
    for ds in datasets:
        print(
            f"  {ds.name}: {ds.input_manifest} ∩ {ds.source_manifest_dir}"
            f" → {ds.output_dir} (prefix={ds.prefix},"
            f" update_metadata={ds.update_metadata},"
            f" dataset_name={ds.dataset_name})"
        )
    if errors:
        print("=== validation errors ===")
        for e in errors:
            print(f"  {e}")
        return 1
    if args.dry_run:
        return 0

    from audio_intelligence_tpu.data.manifest import create_subset_manifest

    ok, failed = [], []
    for ds in datasets:
        t0 = time.time()
        try:
            summary = create_subset_manifest(
                ds.input_manifest,
                ds.source_manifest_dir,
                ds.output_dir,
                prefix=ds.prefix,
                update_metadata=ds.update_metadata,
                dataset_name=ds.dataset_name,
            )
            print(
                f"[ok] {ds.name}: {summary['num_entries']} entries,"
                f" {summary['num_matched_keys']}/{summary['num_filter_keys']}"
                f" keys matched ({time.time() - t0:.1f}s)"
            )
            ok.append(ds.name)
        except Exception:
            traceback.print_exc()
            print(f"[FAIL] {ds.name}")
            failed.append(ds.name)

    print(f"=== done: {len(ok)} ok, {len(failed)} failed ===")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
