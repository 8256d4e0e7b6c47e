"""Multimodal pipeline queries — rows-only verified (binary payloads
have no SQL oracle; determinism comes from the seeded synthetic corpus
and the stubbed decoder)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as M
from . import register


@register(
    "q_multimodal_features",
    None,
    doc="Arrow-batched mapInPandas feature extraction over binary media "
        "payloads (north-star multimodal op; decode stubbed "
        "deterministically — see operators/multimodal.py).",
)
def q_multimodal_features(spark, sf_dir):
    media = M.synth_media_table(spark, n=96)
    return M.extract_features(media)


@register(
    "q_multimodal_frames",
    None,
    doc="Video frame sampling as a mapInPandas flat-map (rows out > rows "
        "in) + per-media frame counts.",
)
def q_multimodal_frames(spark, sf_dir):
    media = M.synth_media_table(spark, n=96)
    frames = M.sample_frames(media, every_s=2.0)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_frames"))
