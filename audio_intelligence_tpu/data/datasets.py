"""Multi-dataset dict-style access: readers, SingleDataset, CombinedDataset.

Capability parity with UALM/dataloader/dataset.py (SingleDataset:61-126,
CombinedDataset:127-301 incl. the dataset-registry env lookup) and the
multimodal_loader readers (text_loader.py TextReader:15-88,
dialogue_loader.py DialogueReader:18-120). The lhotse-backed audio reader
honors the reference cuts/recordings manifest contract via
``data/lhotse_reader.py`` (dependency-free parser; real lhotse when
installed); tar-shard byte-range readers from ``data/tarshard.py`` cover
the tarball entries.

Registry: colon-separated YAML/JSON files in ``$AIT_DATASET_REGISTRY``
(``$ESPNET_DATASET_REGISTRY`` also honored for drop-in parity), each
mapping ``name → {path: dataset.json}`` (train.py:221-253 writes these on
rank 0 in the reference).
"""

from __future__ import annotations

import json
import logging
import os
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path
from typing import Any, Dict, List, Tuple

logger = logging.getLogger(__name__)


class TextReader:
    """Plain (``<id> <text>``) or JSONL (``{"id","text"}``) text reader
    (text_loader.py:15-88); format from the file suffix."""

    def __init__(self, text_file: str, valid_ids: list | None = None):
        self.data: Dict[str, str] = {}
        is_jsonl = Path(text_file).suffix == ".jsonl"
        valid = set(valid_ids) if valid_ids is not None else None
        with open(text_file, encoding="utf-8") as f:
            for i, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                if is_jsonl:
                    row = json.loads(line)
                    if "id" not in row or "text" not in row:
                        logger.warning("skip line %d: missing id/text", i)
                        continue
                    key, content = row["id"], row["text"]
                else:
                    parts = line.split(maxsplit=1)
                    if len(parts) != 2:
                        continue
                    key, content = parts
                if valid is None or key in valid:
                    self.data[key] = content

    def keys(self):
        return self.data.keys()

    def __getitem__(self, key: str) -> str:
        return self.data[key]

    def __len__(self):
        return len(self.data)


class DialogueReader:
    """JSONL dialogues ``{"example_id", "messages": [{role, modality,
    content}]}`` → list of (role, modality, content) tuples
    (dialogue_loader.py:18-120). Audio contents reference tar-shard keys
    and are resolved lazily via an optional audio reader."""

    VALID_ROLES = {"user", "assistant", "system"}
    VALID_MODALITIES = {"text", "audio", "image", "video", "toolcall"}

    def __init__(self, dialogue_file: str, valid_ids: list | None = None,
                 audio_reader=None):
        self.dialogues: Dict[str, list] = {}
        self.audio_reader = audio_reader
        valid = set(valid_ids) if valid_ids is not None else None
        with open(dialogue_file, encoding="utf-8") as f:
            for i, line in enumerate(f):
                row = json.loads(line)
                if "example_id" not in row or "messages" not in row:
                    raise ValueError(f"line {i} of {dialogue_file} is invalid")
                if valid is not None and row["example_id"] not in valid:
                    continue
                self.dialogues[row["example_id"]] = row["messages"]

    def keys(self):
        return self.dialogues.keys()

    def __getitem__(self, key: str):
        out = []
        for msg in self.dialogues[key]:
            role, modality = msg["role"], msg["modality"]
            if role not in self.VALID_ROLES:
                raise ValueError(f"invalid role {role!r}")
            if modality not in self.VALID_MODALITIES:
                raise ValueError(f"invalid modality {modality!r}")
            content = msg["content"]
            if modality == "audio" and self.audio_reader is not None:
                content = self.audio_reader.read(content)
            out.append((role, modality, content))
        return out

    def __len__(self):
        return len(self.dialogues)


class TarAudioReader:
    """Tar-shard audio reader with the dict contract (replaces the
    reference's LhotseAudioReader; backed by data/tarshard.py range
    reads). ``path`` is the sqlite/jsonl index; tars live beside it."""

    def __init__(self, index_path: str, valid_ids: list | None = None):
        from audio_intelligence_tpu.data.tarshard import TarballAudioReader

        self._reader = TarballAudioReader(
            index_path, str(Path(index_path).parent)
        )
        self._valid = set(valid_ids) if valid_ids is not None else None

    def keys(self):
        ks = self._reader.keys()
        if self._valid is not None:
            return [k for k in ks if k in self._valid]
        return ks

    def read(self, key: str):
        return self._reader.read(key)

    def __getitem__(self, key: str):
        if self._valid is not None and key not in self._valid:
            raise KeyError(key)
        return self._reader.read(key)


class TarAudioSegmentReader:
    """Audio sub-segment reader: ``path`` is a jsonl of rows
    ``{"id", "key", "index", "start", "duration"}`` (written by the
    manifest converter for segmented audio-only datasets); reads the
    (start, duration) window of tar member ``key`` via byte-range
    seek, mirroring the reference's offset/duration manifest fields
    (convert_tar_to_ualm_manifest.py build_unified_entry:226-244)."""

    def __init__(self, segments_path: str, valid_ids: list | None = None):
        self.segments: Dict[str, Dict[str, Any]] = {}
        valid = set(valid_ids) if valid_ids is not None else None
        index_paths = set()
        with open(segments_path, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                row = json.loads(line)
                if valid is not None and row["id"] not in valid:
                    continue
                self.segments[row["id"]] = row
                index_paths.add(row["index"])
        from audio_intelligence_tpu.data.tarshard import TarballAudioReader

        self._readers = {
            p: TarballAudioReader(p, str(Path(p).parent)) for p in index_paths
        }

    def keys(self):
        return self.segments.keys()

    def __getitem__(self, sid: str):
        seg = self.segments[sid]
        return self._readers[seg["index"]].read(
            seg["key"],
            start_sec=seg.get("start") or None,
            duration_sec=seg.get("duration") or None,
        )

    def __len__(self):
        return len(self.segments)


def _lhotse_audio(*a, **k):
    # deferred import keeps datasets.py free of the manifest parser
    from audio_intelligence_tpu.data.lhotse_reader import LhotseAudioReader

    return LhotseAudioReader(*a, **k)


READER_TYPES = {
    "text": TextReader,
    "dialogue": DialogueReader,
    "tar_audio": TarAudioReader,
    "tar_audio_segment": TarAudioSegmentReader,
    # the reference lhotse-cuts contract (audio_loader.py:23-110):
    # cuts/recordings jsonl.gz manifest dirs, real lhotse when installed
    "lhotse_audio": _lhotse_audio,
}


class SingleDataset:
    """One dataset JSON (dataset.py:61-126): ``{"data_entry": [{name,
    path, reader}], "samples": [ids]}``; samples striped by rank."""

    def __init__(self, json_file: str, rank: int = 0, world_size: int = 1):
        with open(json_file, encoding="utf-8") as f:
            data = json.load(f)
        self.samples: List[str] = data["samples"][rank::world_size]
        self.readers: Dict[str, Any] = {}
        for entry in data["data_entry"]:
            reader_type = entry["reader"]
            if reader_type not in READER_TYPES:
                raise ValueError(f"Unknown reader type: {reader_type}")
            self.readers[entry["name"]] = READER_TYPES[reader_type](
                entry["path"], valid_ids=self.samples
            )

    @property
    def entries(self) -> List[str]:
        return list(self.readers.keys())

    @property
    def sample_ids(self) -> List[str]:
        return self.samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, sample_id: str) -> Dict[str, Any]:
        return {name: r[sample_id] for name, r in self.readers.items()}


def load_dataset_registry() -> Dict[str, str]:
    """Merge registry YAML/JSON files from $AIT_DATASET_REGISTRY (or
    $ESPNET_DATASET_REGISTRY), colon-separated (dataset.py:216-257)."""
    registry: Dict[str, str] = {}
    env = os.environ.get("AIT_DATASET_REGISTRY", "") or os.environ.get(
        "ESPNET_DATASET_REGISTRY", ""
    )
    for path in [p.strip() for p in env.split(":") if p.strip()]:
        if not os.path.exists(path):
            logger.warning("registry file not found: %s", path)
            continue
        try:
            text = open(path, encoding="utf-8").read()
            try:
                content = json.loads(text)
            except json.JSONDecodeError:
                import yaml  # optional; JSON registries work without it

                content = yaml.safe_load(text)
            for name, info in (content or {}).items():
                if isinstance(info, dict) and "path" in info:
                    if name in registry:
                        logger.warning(
                            "dataset %r already registered; overriding from %s",
                            name, path,
                        )
                    registry[name] = info["path"]
        except Exception as e:  # noqa: BLE001 — mirror reference leniency
            logger.error("error loading registry %s: %s", path, e)
    return registry


class CombinedDataset:
    """Multiple SingleDatasets, from direct (name, json) pairs and/or
    registered names; parallel load; keyed ``(task, name, id)`` access
    (dataset.py:127-301)."""

    def __init__(
        self,
        datasets: List[Tuple[str, str]] = (),
        registered_datasets: List[str] = (),
        num_worker: int = 1,
        rank: int = 0,
        world_size: int = 1,
    ):
        paths: List[Tuple[str, str]] = []
        seen: set[str] = set()
        for name, json_path in datasets:
            if name in seen:
                raise ValueError(f"Duplicate dataset name: {name}")
            paths.append((name, json_path))
            seen.add(name)
        registry = load_dataset_registry()
        for name in registered_datasets:
            if name in seen:
                raise ValueError(f"Duplicate dataset name: {name}")
            if name not in registry:
                raise ValueError(
                    f"Dataset {name!r} not in registry. "
                    f"Available: {list(registry)}"
                )
            paths.append((name, registry[name]))
            seen.add(name)

        self.datasets: Dict[str, SingleDataset] = {}

        def load(arg):
            name, path = arg
            return name, SingleDataset(path, rank, world_size)

        workers = max(1, min(num_worker, len(paths)))
        if workers == 1:
            for arg in paths:
                name, ds = load(arg)
                self.datasets[name] = ds
                logger.info("loaded dataset [%s] size [%d]", name, len(ds))
        else:
            # threads, not processes: readers are index lookups (sqlite /
            # in-memory dicts), so the GIL is released in I/O and a pool of
            # threads avoids pickling readers across processes
            with ThreadPoolExecutor(max_workers=workers) as ex:
                futs = [ex.submit(load, a) for a in paths]
                for fut in as_completed(futs):
                    name, ds = fut.result()
                    self.datasets[name] = ds
                    logger.info("loaded dataset [%s] size [%d]", name, len(ds))

    @property
    def dataset_names(self) -> List[str]:
        return list(self.datasets.keys())

    def verify_subset_entries(self, task, data_name, required_entries):
        entries = self.datasets[data_name].entries
        for e in required_entries:
            if e not in entries:
                raise ValueError(
                    f"Task {task} requires entry {e} "
                    f"but is missing in dataset: {data_name}"
                )

    def get_all_examples(self) -> Dict[str, List[str]]:
        return {n: d.sample_ids for n, d in self.datasets.items()}

    def __len__(self):
        return sum(len(d) for d in self.datasets.values())

    def __getitem__(self, key: Tuple[str, str, str]):
        _, dataset_name, sample_id = key
        return key, self.datasets[dataset_name][sample_id]


def prepare_dataset_json(
    triplets: List[str], output_json: str
) -> int:
    """Build a dataset JSON from name,path,reader triplets; samples are
    the ids present in ALL sources (scripts/prepare_dataset_json.py:80-120).
    Returns the sample count."""
    info, sources = [], {}
    for triplet in triplets:
        parts = triplet.split(",")
        if len(parts) != 3:
            raise ValueError(f"Invalid triplet: {triplet!r} (want name,path,reader)")
        name, path, reader = parts
        if reader not in READER_TYPES:
            raise ValueError(f"Invalid reader {reader!r}: {list(READER_TYPES)}")
        info.append({"name": name, "path": str(Path(path).resolve()),
                     "reader": reader})
        sources[name] = READER_TYPES[reader](path)
    if not sources:
        raise ValueError("No data sources provided")
    valid = set(next(iter(sources.values())).keys())
    for r in sources.values():
        valid &= set(r.keys())
    with open(output_json, "w", encoding="utf-8") as f:
        json.dump({"data_entry": info, "samples": sorted(valid)}, f,
                  indent=2, ensure_ascii=False)
    return len(valid)
