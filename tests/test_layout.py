"""Z-order layout: physical file stats must enable pruning on BOTH dims.

The measurable contract of a z-ordered layout is in the parquet footers:
each file's (source, event_ts) min/max ranges cover a small rectangle of
the domain, so predicate pushdown on EITHER dimension skips most row
groups. The baseline round-robin layout covers ~the full range of both
dimensions in every file (nothing can be skipped)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.eventize import eventize
from workbook_exporter_fe_spark.sources.datagen import gen_sequences


def _file_spans(path: str, sources: list[str]):
    """Per file: (fraction of source domain covered, fraction of time span)."""
    src_pos = {s: i for i, s in enumerate(sources)}
    spans = []
    t_lo = t_hi = None
    metas = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.read_metadata(f)
        smin = smax = tmin = tmax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "source":
                    smin = st.min if smin is None else min(smin, st.min)
                    smax = st.max if smax is None else max(smax, st.max)
                elif name == "event_ts_s":
                    # epoch-seconds long companion: timestamp_ntz columns
                    # get no parquet min/max from this writer, int64 does
                    tmin = st.min if tmin is None else min(tmin, st.min)
                    tmax = st.max if tmax is None else max(tmax, st.max)
        metas.append((smin, smax, tmin, tmax))
        t_lo = tmin if t_lo is None else min(t_lo, tmin)
        t_hi = tmax if t_hi is None else max(t_hi, tmax)
    t_span = float(t_hi - t_lo) or 1.0
    for smin, smax, tmin, tmax in metas:
        s_frac = (src_pos[smax] - src_pos[smin] + 1) / len(sources)
        f_frac = (tmax - tmin) / t_span
        spans.append((s_frac, f_frac))
    return spans


@pytest.fixture(scope="module")
def corpus(spark):
    seq = gen_sequences(spark, 30_000, seed=42)
    ev = eventize(seq).select("source", "event_ts", "v", "doc_id")
    return ev.withColumn(
        "event_ts_s", F.col("event_ts").cast("timestamp").cast("long")
    )


def test_zorder_files_cover_small_rectangles(spark, corpus, tmp_path):
    from workbook_exporter_fe_spark.sources.layout import write_zordered

    sources = sorted(r[0] for r in corpus.select("source").distinct().collect())

    z_path = str(tmp_path / "zorder")
    write_zordered(corpus, z_path, "source", "event_ts_s", n_files=16)
    naive_path = str(tmp_path / "naive")
    corpus.repartition(16).write.mode("overwrite").parquet(naive_path)

    z_spans = _file_spans(z_path, sources)
    n_spans = _file_spans(naive_path, sources)
    z_avg_s = sum(s for s, _ in z_spans) / len(z_spans)
    z_avg_t = sum(t for _, t in z_spans) / len(z_spans)
    n_avg_s = sum(s for s, _ in n_spans) / len(n_spans)
    n_avg_t = sum(t for _, t in n_spans) / len(n_spans)

    # round-robin: every file covers ~the whole domain on both dims
    assert n_avg_s > 0.9 and n_avg_t > 0.9
    # z-order: the average file covers a small rectangle on BOTH dims —
    # that narrowness is exactly what lets parquet skip row groups for
    # filters on either dimension
    assert z_avg_s < 0.5 * n_avg_s
    assert z_avg_t < 0.5 * n_avg_t
    # and the data itself is untouched by the rewrite
    assert (
        spark.read.parquet(z_path)
        .select(*corpus.columns)
        .exceptAll(corpus)
        .count()
        == 0
    )


def test_morton_interleave_bits():
    from workbook_exporter_fe_spark.sources.layout import morton2

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    df = spark.createDataFrame([(0b1011, 0b0110)], "a long, b long")
    got = df.select(morton2(F.col("a"), F.col("b")).alias("z")).first()["z"]

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == ref(0b1011, 0b0110)
