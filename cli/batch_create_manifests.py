#!/usr/bin/env python
"""Batch manifest creation: run the full shard+manifest pipeline for many
datasets from one YAML, in parallel, with resume.

Parity with UALM/tools/object_storage_manifest/batch_create_manifests.py.

Config YAML:
  out_root: exp/shards
  shard_size: 512
  num_workers: 4          # shard-write workers per dataset
  parallel_datasets: 2    # datasets processed concurrently
  datasets:
    - name: musiccaps
      input: data/musiccaps.jsonl        # jsonl/json/txt/dir (load_entries)
      audio_source_dir: /data/audio      # optional, for relative locations
    - name: fma
      input: /data/fma/wavs

Usage:
  python cli/batch_create_manifests.py --config batch.yaml [--resume]
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run_one(job):
    from audio_intelligence_tpu.data.manifest import (
        create_manifest_pipeline,
        load_entries,
    )

    name, input_path, out_dir, shard_size, num_workers, resume, src_dir = job
    try:
        entries = load_entries(input_path)
        summary = create_manifest_pipeline(
            entries,
            out_dir,
            prefix=name,
            shard_size=shard_size,
            num_workers=num_workers,
            resume=resume,
            audio_source_dir=src_dir,
        )
        return name, summary, None
    except Exception as e:  # keep the batch going; report at the end
        return name, None, f"{e}\n{traceback.format_exc()}"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    import yaml

    with open(args.config, encoding="utf-8") as f:
        doc = yaml.safe_load(f)

    out_root = Path(doc["out_root"])
    shard_size = int(doc.get("shard_size", 512))
    num_workers = int(doc.get("num_workers", 0))
    parallel = int(doc.get("parallel_datasets", 1))

    jobs = [
        (
            ds["name"],
            ds["input"],
            str(out_root / ds["name"]),
            shard_size,
            num_workers,
            args.resume,
            ds.get("audio_source_dir"),
        )
        for ds in doc["datasets"]
    ]

    if parallel > 1 and len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        # threads, not processes: each job already fans out its shard
        # writes to worker processes
        with ThreadPoolExecutor(max_workers=parallel) as ex:
            results = list(ex.map(_run_one, jobs))
    else:
        results = [_run_one(j) for j in jobs]

    ok, failed = {}, {}
    for name, summary, err in results:
        (failed if err else ok)[name] = err or summary
    print(json.dumps({"ok": ok, "failed": list(failed)}, indent=2))
    for name, err in failed.items():
        print(f"\n--- {name} FAILED ---\n{err}", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
