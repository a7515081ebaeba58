"""Shift-invariance of content-defined segment dedup.

The decisive case for dedup_segments_cdc over dedup_paragraphs: a passage
duplicated at a 1-word offset. Fixed 10-word chunking hashes the passage into
different chunks in each document (every chunk crosses the offset), so the
aligned dedup PROVABLY sees zero duplicate segments; content-defined
boundaries resynchronize inside the passage, so its interior segments are
byte-identical in both documents and the first-occurrence election drops
them from the second.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.plans.text_queries import (
    _cdc_segments,
    _paragraph_segments,
    _segment_rollup,
)

# a ~42-word passage with distinct words (no accidental intra-passage dupes)
_PASSAGE = " ".join(f"shared{i:02d}" for i in range(42))


def _docs(spark):
    # doc 1: passage after a 7-word prefix; doc 2: same passage after an
    # 8-word prefix — a 1-word shift, the smallest possible misalignment.
    pre1 = " ".join(f"alpha{i}" for i in range(7))
    pre2 = " ".join(f"beta{i}" for i in range(8))
    suf1 = " ".join(f"tail{i}" for i in range(5))
    suf2 = " ".join(f"coda{i}" for i in range(6))
    rows = [
        (1, "web", f"{pre1} {_PASSAGE} {suf1}"),
        (2, "web", f"{pre2} {_PASSAGE} {suf2}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _dropped(rollup_df) -> int:
    return rollup_df.agg(F.sum("segments_dropped")).first()[0]


def test_aligned_chunking_misses_one_word_offset(spark):
    d = _docs(spark)
    dropped = _dropped(_segment_rollup(_paragraph_segments(d), F.col("seg")))
    assert dropped == 0, (
        "aligned 10-word chunking should be blind to the 1-word-offset "
        f"duplicate passage, got {dropped} dropped segments"
    )


def test_cdc_chunking_catches_one_word_offset(spark):
    d = _docs(spark)
    dropped = _dropped(_segment_rollup(_cdc_segments(d), F.col("seg")))
    assert dropped >= 1, (
        "content-defined chunking must drop at least one interior segment "
        "of the shifted duplicate passage"
    )


def test_cdc_interior_segments_identical_across_offsets(spark):
    # the mechanism itself: every segment FULLY inside the passage must be
    # produced identically in both documents regardless of the offset
    d = _docs(spark)
    segs = _cdc_segments(d).filter(
        F.col("seg").rlike("^shared[0-9]{2}( shared[0-9]{2})*$")
    )
    by_doc = {
        r["doc_id"]: r["segs"]
        for r in segs.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("seg")).alias("segs"))
        .collect()
    }
    def interior(segs):
        # exclude segments whose boundary windows can see OUTSIDE the
        # passage: those starting at the passage head (their start breakpoint
        # straddles the differing prefixes) and those reaching the last W
        # words (their END is decided by a breakpoint whose 3-word window
        # straddles the differing suffixes)
        return [
            s
            for s in segs
            if not s.startswith("shared00")
            and not any(w in s for w in ("shared39", "shared40", "shared41"))
        ]

    shared1 = interior(by_doc[1])
    shared2 = interior(by_doc[2])
    assert shared1 == shared2
    assert len(shared1) >= 1


def test_cdc_segments_reassemble_document(spark):
    # segmentation must be a partition of the word sequence: joining the
    # segments in position order reconstructs the text exactly
    d = _docs(spark)
    rebuilt = (
        _cdc_segments(d)
        .groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("pos", "seg"))).seg, " ").alias("t"))
    )
    orig = {r["doc_id"]: r["text"] for r in d.collect()}
    for r in rebuilt.collect():
        assert r["t"] == orig[r["doc_id"]]
