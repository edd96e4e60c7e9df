"""Stage-boundary checkpointing for multi-stage corpus pipelines.

At the target scale a corpus build is hours of work across ~9 stages; a
failure in stage 7 must not re-run stages 1-6, and a config tweak to a
LATE stage (say the split fraction) should reuse every earlier stage's
output. ``StageStore`` gives ``build_corpus`` both:

- each completed stage's output frames land under
  ``root/<config-fingerprint>/<stage>/<frame>/`` as parquet, with a
  ``_COMPLETE`` marker written last (the same publish-marker contract as
  the warehouse's ``_SUCCESS`` two-phase staging — a crashed writer
  leaves no marker, and the retry overwrites the partial dir);
- a resumed run with the same root + config loads every completed stage
  and computes only from the first missing one on;
- downstream stages read the persisted parquet, not the live lineage —
  the checkpoint doubles as a lineage cut, so a 9-stage DAG never
  re-executes stage 1 once per downstream action (the reliable-checkpoint
  role, without pinning executor memory the way ``.cache()`` does).

The fingerprint covers the pipeline CONFIG (scalar knobs + which optional
inputs are present), not the input DATA — like any checkpoint store, the
caller owns input identity: rerunning against a different ``docs`` under
the same root + config resumes from the old run's outputs. Point each
dataset at its own root (or change any knob) to get a fresh namespace.
Different configs never collide: they hash to different subdirs, so no
invalidation logic exists to get wrong.

Paths go through ``os.path`` like the rest of the warehouse layer
(local/NFS contract; on object stores, mount or swap the marker ops for
the Hadoop FileSystem API — the layout itself is relocatable).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

_COMPLETE = "_COMPLETE"


class StageStore:
    def __init__(self, spark: SparkSession, root: str, config: dict):
        self.spark = spark
        blob = json.dumps(config, sort_keys=True, default=repr)
        self.fingerprint = hashlib.sha256(blob.encode()).hexdigest()[:12]
        self.base = os.path.join(root, self.fingerprint)
        os.makedirs(self.base, exist_ok=True)
        cfg = os.path.join(self.base, "_config.json")
        if not os.path.exists(cfg):  # human-readable namespace key
            tmp = cfg + ".tmp"
            with open(tmp, "w") as f:
                f.write(blob)
            os.replace(tmp, cfg)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def has(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._dir(stage), _COMPLETE))

    def completed(self) -> list[str]:
        if not os.path.isdir(self.base):
            return []
        return sorted(
            e for e in os.listdir(self.base)
            if self.has(e)
        )

    def save(
        self, stage: str, frames: dict[str, DataFrame],
        stats: dict | None = None,
    ) -> dict[str, DataFrame]:
        """Persist a stage's output frames + scalar stats, marker last.
        Returns the frames READ BACK from parquet — callers hand these to
        the next stage so downstream plans start at the checkpoint."""
        d = self._dir(stage)
        out: dict[str, DataFrame] = {}
        for name, df in frames.items():
            p = os.path.join(d, name)
            df.write.mode("overwrite").parquet(p)
            out[name] = self.spark.read.parquet(p)
        with open(os.path.join(d, "_stats.json"), "w") as f:
            json.dump(stats or {}, f)
        with open(os.path.join(d, _COMPLETE), "w") as f:
            f.write("")
        return out

    def load(self, stage: str, names: list[str]) -> dict[str, DataFrame]:
        d = self._dir(stage)
        return {
            n: self.spark.read.parquet(os.path.join(d, n)) for n in names
        }

    def stats(self, stage: str) -> dict:
        p = os.path.join(self._dir(stage), "_stats.json")
        with open(p) as f:
            return json.load(f)

    def gc(self, keep_latest: int = 1) -> list[str]:
        """Delete stale config namespaces under the root — every tuning
        iteration leaves one behind, and at scale each holds a full
        corpus copy per stage. Keeps this store's own namespace plus the
        ``keep_latest - 1`` most recently modified others (an A/B pair
        keeps both with keep_latest=2). Returns removed fingerprints."""
        import shutil

        root = os.path.dirname(self.base)
        others = sorted(
            (
                e for e in os.listdir(root)
                if e != self.fingerprint
                and os.path.isdir(os.path.join(root, e))
            ),
            key=lambda e: os.path.getmtime(os.path.join(root, e)),
            reverse=True,
        )
        removed = []
        for e in others[max(0, keep_latest - 1):]:
            shutil.rmtree(os.path.join(root, e), ignore_errors=True)
            removed.append(e)
        return removed
