"""Micro-batch staging for the streaming twins' availableNow replays.

Shared by every streaming twin (RFM/ABC/heavy-hitters/Lorenz/vocab,
and the transformWithState router): a list of batch frames becomes
single-file parquet drops with strictly increasing mtimes, so a
``maxFilesPerTrigger=1`` / availableNow file stream replays them as
separate micro-batches in a deterministic order.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

__all__ = ["stage_two_batch_stream"]


def stage_two_batch_stream(root: str, batches: list[DataFrame]):
    """Stage ``batches`` as single-file parquet drops under
    ``root/src`` with strictly increasing mtimes. Returns
    ``(src_dir, schema)``."""
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir)
    schema = None
    for i, b in enumerate(batches):
        stage = os.path.join(root, f"stage{i}")
        b.coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = os.path.join(src_dir, f"batch-{i}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i * 3600,) * 2)
        schema = b.schema
    return src_dir, schema
