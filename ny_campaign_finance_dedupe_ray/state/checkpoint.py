"""Per-stage Parquet checkpoints with lineage manifests — the generalization
of the reference's durable mid-pipeline checkpoint (blocking_map persisted in
Postgres and resumed by /root/reference/dedupe_extension/
start_at_clustering.py:163-205; final outputs reloaded by
data_load/cluster_data_load.py:8-73).

Every stage writes a directory of partitioned Parquet plus ``_manifest.json``
recording (stage params hash, input fingerprint, row count, engine version).
A rerun with identical params+input skips the stage and re-reads the
checkpoint; a stale checkpoint (params or upstream fingerprint changed) is
refused and recomputed — "manifests record input fingerprints so a resumed
run refuses stale checkpoints" (SURVEY.md §7).  Writes are atomic: a temp
directory renamed into place, so a crashed writer never yields a
half-checkpoint that parses as complete.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable

import ray.data

from .. import __version__

MANIFEST = "_manifest.json"


def params_hash(params: dict) -> str:
    blob = json.dumps(params, sort_keys=True, default=repr).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def dir_fingerprint(path: str) -> str:
    """Cheap content fingerprint of an input directory/file: names+sizes."""
    entries = []
    if os.path.isfile(path):
        entries.append((os.path.basename(path), os.path.getsize(path)))
    else:
        for root, _, files in os.walk(path):
            for f in sorted(files):
                if f.startswith("_"):
                    continue
                p = os.path.join(root, f)
                entries.append((os.path.relpath(p, path), os.path.getsize(p)))
    blob = json.dumps(sorted(entries)).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class StageCheckpoint:
    """One checkpointable stage rooted at ``{workdir}/{name}``."""

    def __init__(self, workdir: str, name: str):
        self.dir = os.path.join(workdir, name)
        self.name = name

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.dir, MANIFEST)

    def manifest(self) -> dict | None:
        try:
            with open(self.manifest_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def is_valid(self, params: dict, input_fingerprint: str) -> bool:
        m = self.manifest()
        return (
            m is not None
            and m.get("complete") is True
            and m.get("params_hash") == params_hash(params)
            and m.get("input_fingerprint") == input_fingerprint
        )

    def fingerprint(self) -> str:
        """Fingerprint of this checkpoint's own output (chains stages)."""
        m = self.manifest()
        if m is None:
            raise FileNotFoundError(self.manifest_path)
        return m["output_fingerprint"]

    def read(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.dir)

    def run(
        self,
        factory: Callable[[], "ray.data.Dataset"],
        params: dict,
        input_fingerprint: str,
    ) -> "ray.data.Dataset":
        """Return the stage output, recomputing only when the checkpoint is
        missing or stale."""
        if self.is_valid(params, input_fingerprint):
            return self.read()
        # clear half-written temp dirs from DEAD earlier writers (a killed
        # run leaves {dir}.tmp.<other-pid> behind; only the rename below is
        # atomic, so an unfinished temp is safe to discard — but only when
        # its writer is gone: sweeping a LIVE concurrent writer's temp
        # mid-write would let it persist a partial checkpoint as complete)
        parent, base = os.path.split(self.dir)
        os.makedirs(parent or ".", exist_ok=True)
        for entry in os.listdir(parent or "."):
            if not entry.startswith(base + ".tmp."):
                continue
            pid_str = entry.rsplit(".", 1)[-1]
            writer_alive = False
            if pid_str.isdigit() and pid_str != str(os.getpid()):
                try:
                    os.kill(int(pid_str), 0)  # signal 0: portable liveness
                    writer_alive = True
                except ProcessLookupError:
                    writer_alive = False
                except PermissionError:
                    writer_alive = True  # exists, owned by someone else
            # same-host assumption: pids are meaningless across machines, so
            # a workdir shared over NFS should not run concurrent writers on
            # different hosts (single-writer-per-workdir is the contract;
            # the sweep only guards against DEAD local writers)
            if not writer_alive:
                shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
        tmp = self.dir + ".tmp.%d" % os.getpid()
        ds = factory()
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
            # an EMPTY stage output writes no files at all, which would make
            # the checkpoint unreadable (and a resumed run crash instead of
            # resuming past a legitimately-empty stage, e.g. zero candidate
            # pairs) — persist the schema as a zero-row file
            import pyarrow as pa
            import pyarrow.parquet as pq

            try:
                schema = ds.schema()
            except Exception:
                schema = None
            if schema is None:
                empty = pa.table({})
            else:
                # Dataset.schema().types can be numpy dtypes (pandas-block
                # datasets) — normalize before building typed empty columns
                fields = {}
                for name, typ in zip(schema.names, schema.types):
                    if not isinstance(typ, pa.DataType):
                        try:
                            typ = pa.from_numpy_dtype(typ)
                        except (pa.ArrowNotImplementedError, TypeError):
                            typ = pa.string()
                    fields[name] = pa.array([], type=typ)
                empty = pa.table(fields)
            pq.write_table(empty, os.path.join(tmp, "empty-0.parquet"))
        rows = ray.data.read_parquet(tmp).count()
        manifest = {
            "stage": self.name,
            "complete": True,
            "params_hash": params_hash(params),
            "params": {k: repr(v) for k, v in params.items()},
            "input_fingerprint": input_fingerprint,
            "output_fingerprint": dir_fingerprint(tmp),
            "row_count": rows,
            "engine_version": __version__,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        if os.path.exists(self.dir):
            shutil.rmtree(self.dir)
        os.replace(tmp, self.dir)
        return self.read()


class PartitionedCheckpoint:
    """Per-PARTITION checkpoints for shard-parallel stages: one output
    directory (with its own lineage manifest) per input shard, so a failed
    or interrupted run reprocesses ONLY the shards whose manifest is
    missing or stale — never the finished ones, and never one giant file.
    This is the per-partition half of the resume contract (the per-stage
    half is ``StageCheckpoint``); shard manifests carry the same lineage
    fields (params hash, input fingerprint, row count, engine version).

    Shards process sequentially on the driver but each shard's pipeline is
    a full Dataset execution (all cores); at cluster scale shards map to
    input directories (e.g. one per Common-Crawl segment)."""

    def __init__(self, workdir: str, name: str):
        self.dir = os.path.join(workdir, name)
        self.name = name

    def shard(self, shard_id: str) -> StageCheckpoint:
        return StageCheckpoint(self.dir, shard_id)

    def run(
        self,
        shards: "list[tuple[str, str]]",
        factory: Callable[[str], "ray.data.Dataset"],
        params: dict,
    ) -> "ray.data.Dataset":
        """``shards``: [(shard_id, input_path)].  ``factory(input_path)``
        builds one shard's output Dataset.  Returns the union of all shard
        checkpoints; writes a top-level manifest summarizing per-shard
        rows."""
        os.makedirs(self.dir, exist_ok=True)
        summary = {}
        out_fps = []
        for shard_id, path in shards:
            sc = self.shard(shard_id)
            sc.run(lambda p=path: factory(p), params, dir_fingerprint(path))
            summary[shard_id] = sc.manifest()["row_count"]
            out_fps.append(sc.fingerprint())
        combined = hashlib.sha256(
            json.dumps(sorted(zip([s for s, _ in shards], out_fps))).encode()
        ).hexdigest()[:16]
        with open(os.path.join(self.dir, "_shards.json"), "w") as f:
            json.dump(
                {
                    "stage": self.name,
                    "shards": summary,
                    "params_hash": params_hash(params),
                    "output_fingerprint": combined,
                    "written_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                },
                f,
                indent=2,
            )
        # read_parquet rejects a LIST of directories — union per-shard reads
        parts = [self.shard(sid).read() for sid, _ in shards]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def fingerprint(self) -> str:
        """Combined output fingerprint over all shards (chains stages)."""
        with open(os.path.join(self.dir, "_shards.json")) as f:
            return json.load(f)["output_fingerprint"]
