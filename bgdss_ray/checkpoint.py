"""Wave checkpoints: atomic manifests + per-wave parquet partitions.

Reproduces the reference's resume contract — atomic manifest writes via
temp-file + rename (portal_saude_mg.py:749-801) and idempotent re-runs that
skip completed work (file-exists skip, portal_saude_mg.py:451-459) — as
per-partition lineage: each wave writes its documents/crawl-log/seen-delta
partitions and then commits the manifest; a rerun resumes from the last
committed wave (Lance is unavailable in this container, so the layout is
partitioned Parquet + JSON manifest, same semantics).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .politeness import HostState


def atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # atomic on POSIX


def host_state_to_json(state: dict[str, HostState]) -> dict:
    return {
        h: {
            "count": st.count,
            "last_vtime": st.last_vtime,
            "last_pdf_vtime": st.last_pdf_vtime if st.last_pdf_vtime != float("-inf") else None,
            "window": list(st.window),
        }
        for h, st in state.items()
    }


def host_state_from_json(obj: dict) -> dict[str, HostState]:
    out: dict[str, HostState] = {}
    for h, d in obj.items():
        st = HostState()
        st.count = d["count"]
        st.last_vtime = d["last_vtime"]
        st.last_pdf_vtime = d["last_pdf_vtime"] if d["last_pdf_vtime"] is not None else float("-inf")
        st.window.extend(d["window"])
        out[h] = st
    return out


class CrawlCheckpoint:
    def __init__(self, out_dir: str):
        self.dir = out_dir
        self.manifest_path = os.path.join(out_dir, "manifest.json")

    def load_manifest(self) -> dict | None:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return json.load(f)

    def commit_wave(
        self,
        wave: int,
        next_rank: int,
        pages_fetched: int,
        scheduler,
    ) -> None:
        """``scheduler`` is a ShardedPoliteness (dump_state) or a plain
        host-state dict (legacy)."""
        state = (
            scheduler.dump_state()
            if hasattr(scheduler, "dump_state")
            else host_state_to_json(scheduler)
        )
        atomic_write_json(
            self.manifest_path,
            {
                "completed_wave": wave,
                "next_rank": next_rank,
                "pages_fetched": pages_fetched,
                "host_state": state,
            },
        )

    # -- partition paths -------------------------------------------------
    def wave_dir(self, kind: str, wave: int) -> str:
        p = os.path.join(self.dir, kind, f"wave={wave}")
        os.makedirs(p, exist_ok=True)
        return p

    def write_table(self, kind: str, wave: int, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(self.wave_dir(kind, wave), "part-0.parquet"))

    def write_seen_delta(self, wave: int, hashes: np.ndarray) -> None:
        t = pa.table({"url_hash": pa.array(hashes, type=pa.uint64())})
        self.write_table("seen", wave, t)

    def write_frontier_next(self, wave: int, table: pa.Table) -> None:
        self.write_table("frontier_next", wave, table)

    def load_seen_upto(self, wave: int) -> np.ndarray:
        parts = []
        for w in range(wave + 1):
            p = os.path.join(self.dir, "seen", f"wave={w}", "part-0.parquet")
            if os.path.exists(p):
                parts.append(pq.read_table(p).column("url_hash").to_numpy())
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)

    def load_frontier_next(self, wave: int) -> pa.Table | None:
        """Read the wave's frontier dir — one driver-written part file OR
        several executor-written files (Dataset.write_parquet)."""
        d = os.path.join(self.dir, "frontier_next", f"wave={wave}")
        if not os.path.isdir(d):
            return None
        files = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )
        if not files:
            return None
        return pa.concat_tables(
            [pq.read_table(os.path.join(d, f)) for f in files]
        )

    def frontier_next_dir(self, wave: int) -> str:
        """Path for Dataset-written frontier checkpoints (distributed
        priority backlog); creates the dir."""
        return self.wave_dir("frontier_next", wave)

    def read_all(self, kind: str) -> pa.Table | None:
        """Concatenate all wave partitions of documents/crawl_log/metrics.

        A wave dir may hold one driver-written part file or several
        executor-written parquet files (ds.write_parquet) — read them all.
        """
        root = os.path.join(self.dir, kind)
        if not os.path.isdir(root):
            return None
        waves = sorted(
            (d for d in os.listdir(root) if d.startswith("wave=")),
            key=lambda d: int(d.split("=")[1]),
        )
        tables = []
        for d in waves:
            wd = os.path.join(root, d)
            files = sorted(
                f for f in os.listdir(wd) if f.endswith(".parquet")
            )
            for f in files:
                t = pq.read_table(os.path.join(wd, f))
                if t.num_rows:
                    tables.append(t)
        return pa.concat_tables(tables) if tables else None
