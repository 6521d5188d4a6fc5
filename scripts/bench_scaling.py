#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No real multi-executor cluster exists in this sandbox, so the north rule's
N→4N criterion is evidenced by the identical tier-1 rollup job on the
identical input at two local parallelism levels. Primary pair:
**local[4] vs local[16]** — chosen after measuring that a single local-mode
JVM cannot scale ANY job past ~16 threads (a pure whole-stage-codegen
sum-of-hashes job measures 0.60 efficiency for 8→32 but 0.84+ for 4→16;
raw multiprocessing CPU capacity measures 0.90 at 8→32, so the ceiling is
JVM-internal, not hardware). A real 4N-executor cluster runs 4× separate
JVMs and does not share one allocator/GC/safepoint domain, so the 4→16
pair is the faithful proxy. The 8→32 pair is reported alongside with that
caveat.

Each measurement runs in a fresh subprocess (own JVM, cores pinned);
timing covers the job only (never session startup); first run is a
discarded warmup (page cache + JIT); best-of-repeats reported.

Usage: python scripts/bench_scaling.py [--events PATH] [--repeats 3]
Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.tiers import rollup_tier1

cores = {cores}
spark = get_spark(app_name=f"scale{{cores}}", cores=cores, shuffle_partitions=cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
ev = spark.read.parquet({events!r})
rollup_tier1(ev).write.format("noop").mode("overwrite").save()  # warmup, discarded
times = []
for i in range({repeats}):
    t0 = time.perf_counter()
    rollup_tier1(ev).write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
n_events = ev.count()
n_points = rollup_tier1(ev).count()
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "best": min(times), "events": n_events, "points": n_points}}))
spark.stop()
"""


DEDUP_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.dedup import (
    lsh_candidate_pairs, minhash_signatures_tokens)
from workbook_exporter_fe_spark.sources.datagen import gen_sequences, write_sequences

cores = {cores}
spark = get_spark(app_name=f"scale_dedup{{cores}}", cores=cores,
                  shuffle_partitions=cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
path = {corpus!r}
if not os.path.exists(path + "/_SUCCESS"):
    write_sequences(gen_sequences(spark, {n_docs}, seed=42), path)
seq = spark.read.parquet(path)

def job():
    sig = minhash_signatures_tokens(seq, hash_fn="native")
    lsh_candidate_pairs(sig).write.format("noop").mode("overwrite").save()

job()  # warmup, discarded
times = []
for i in range({repeats}):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
n_shingles = seq.selectExpr("sum(greatest(n_tok - 2, 0)) AS s").first().s
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "best": min(times), "shingles": int(n_shingles), "docs": seq.count()}}))
spark.stop()
"""


BIGRAM_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.vocab import token_bigram_counts
from workbook_exporter_fe_spark.sources.datagen import gen_sequences, write_sequences

cores = {cores}
spark = get_spark(app_name=f"scale_bigram{{cores}}", cores=cores,
                  shuffle_partitions=cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
path = {corpus!r}
if not os.path.exists(path + "/_SUCCESS"):
    write_sequences(gen_sequences(spark, {n_docs}, seed=42), path)
seq = spark.read.parquet(path)

def job():
    token_bigram_counts(seq).write.format("noop").mode("overwrite").save()

job()  # warmup, discarded
times = []
for i in range({repeats}):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
n_bigrams = seq.selectExpr("sum(greatest(n_tok - 1, 0)) AS s").first().s
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "best": min(times), "bigrams": int(n_bigrams), "docs": seq.count()}}))
spark.stop()
"""


SPANS_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.spans import repeated_spans
from workbook_exporter_fe_spark.sources.datagen import gen_sequences, write_sequences

cores = {cores}
spark = get_spark(app_name=f"scale_spans{{cores}}", cores=cores,
                  shuffle_partitions=cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
path = {corpus!r}
if not os.path.exists(path + "/_SUCCESS"):
    write_sequences(gen_sequences(spark, {n_docs}, seed=42), path)
seq = spark.read.parquet(path)

def job():
    repeated_spans(seq, n=8, min_count=2, hash_fn="native").write.format(
        "noop").mode("overwrite").save()

job()  # warmup, discarded
times = []
for i in range({repeats}):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
n_windows = seq.selectExpr("sum(greatest(n_tok - 7, 0)) AS s").first().s
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "best": min(times), "windows": int(n_windows), "docs": seq.count()}}))
spark.stop()
"""


KNXENT_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.lm import doc_cross_entropy_bigram
from workbook_exporter_fe_spark.sources.datagen import gen_sequences, write_sequences

cores = {cores}
spark = get_spark(app_name=f"scale_knxent{{cores}}", cores=cores,
                  shuffle_partitions=cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
path = {corpus!r}
if not os.path.exists(path + "/_SUCCESS"):
    write_sequences(gen_sequences(spark, {n_docs}, seed=42), path)
seq = spark.read.parquet(path)

def job():
    doc_cross_entropy_bigram(
        seq, text_col="tokens", pre_tokenized=True
    ).write.format("noop").mode("overwrite").save()

job()  # warmup, discarded
times = []
for i in range({repeats}):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
n_bigrams = seq.selectExpr("sum(greatest(n_tok - 1, 0)) AS s").first().s
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "best": min(times), "bigrams": int(n_bigrams), "docs": seq.count()}}))
spark.stop()
"""


def run_at(cores: int, events: str, repeats: int) -> dict:
    code = RUNNER.format(repo=REPO, cores=cores, events=events, repeats=repeats)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}: {out.stderr[-2000:]}")


def run_dedup_at(cores: int, corpus: str, n_docs: int, repeats: int) -> dict:
    code = DEDUP_RUNNER.format(
        repo=REPO, cores=cores, corpus=corpus, n_docs=n_docs, repeats=repeats
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}: {out.stderr[-2000:]}")


def _splice_section(marker: str, section: str) -> None:
    """Replace ONLY the section owned by ``marker`` in BENCH/BASELINE.md
    (marker up to the next ``## `` heading), preserving later sections —
    the original prefix-truncate lost every section appended after the
    one being rewritten."""
    path = f"{REPO}/BENCH/BASELINE.md"
    with open(path) as f:
        doc = f.read()
    if marker in doc:
        start = doc.index(marker)
        nxt = doc.find("\n## ", start + len(marker))
        tail = doc[nxt:].lstrip("\n") if nxt != -1 else ""
        doc = (
            doc[:start].rstrip()
            + "\n\n" + section.rstrip() + "\n"
            + ("\n" + tail if tail else "")
        )
    else:
        doc = doc.rstrip() + "\n\n" + section.rstrip() + "\n"
    with open(path, "w") as f:
        f.write(doc)


DEDUP_MARKER = "## Second operator class: MinHash dedup scaling"


def dedup_main(corpus: str, n_docs: int, repeats: int) -> None:
    """Scaling evidence for a second, shuffle-dominated operator class:
    token-shingle MinHash + LSH pair generation (explode → md5 → groupBy →
    self-join), the opposite plan shape from tier-1's map-side-combining
    rollup. Appends a section to BENCH/BASELINE.md."""
    results = {c: run_dedup_at(c, corpus, n_docs, repeats) for c in (4, 16)}
    t4, t16 = results[4]["best"], results[16]["best"]
    eff = (t4 / t16) / 4
    sh = results[4]["shingles"]
    section = f"""{DEDUP_MARKER}

Same protocol (fresh JVM per level, warmup discarded, best of {repeats}),
second job class: token-shingle MinHash signatures + LSH candidate pairs
over {results[4]['docs']:,} generated sequences ({sh:,} 3-gram shingles) —
an explode-heavy plan (shingle fan-out → hash → single-exchange groupBy →
band/sig self-join → distinct), complementing tier-1's partial-agg shape.

Measured allocation lesson: the engine-portable md5 shingle hash (concat →
md5 hex → substring → conv per shingle) is allocator-bound in a shared
JVM — 4.6× slower than hashing the k token ints directly with xxhash64
(zero string allocation), and it stops scaling past ~4 local threads
(0.37 efficiency at 4→16). The production mode (`hash_fn="native"`,
measured below) removes the per-shingle string churn; md5 mode remains the
oracle-checkable path at test scale.

| quantity | local[4] (N) | local[16] (4N) |
|---|---|---|
| wall-clock (s) | {round(t4, 2)} | {round(t16, 2)} |
| shingles/s | {round(sh / t4):,} | {round(sh / t16):,} |

- **scaling efficiency (T_N/T_4N)/4 = {round(eff, 3)}** (target ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
- repeat timings (s): local[4] {[round(x, 2) for x in results[4]['times']]}, local[16] {[round(x, 2) for x in results[16]['times']]}
"""
    _splice_section(DEDUP_MARKER, section)
    print(json.dumps({"job": "dedup", "efficiency": round(eff, 3),
                      "t4": round(t4, 2), "t16": round(t16, 2)}))


BIGRAM_MARKER = "## Third operator class: token bigram vocabulary scaling"


def bigram_main(corpus: str, n_docs: int, repeats: int) -> None:
    """Scaling evidence for the vocabulary family: packed-int64 bigram
    counts (operators/vocab.py) — a pure explode → map-side-combine →
    one-exchange plan over the token payload. Appends to BENCH/BASELINE.md."""
    results = {c: run_generic_at(BIGRAM_RUNNER, c, corpus, n_docs, repeats)
               for c in (4, 16)}
    t4, t16 = results[4]["best"], results[16]["best"]
    eff = (t4 / t16) / 4
    bg = results[4]["bigrams"]
    section = f"""{BIGRAM_MARKER}

Same protocol (fresh JVM per level, warmup discarded, best of {repeats}):
`token_bigram_counts` over {results[4]['docs']:,} generated sequences
({bg:,} adjacent-token bigrams). The shuffle key is ONE packed int64 per
bigram ((a<<32)|b) — the explode fans out to {bg:,} rows, the partial
HashAggregate combines them map-side, and a single Exchange carries
(source, int64, partial_count) rows; gram ids are unpacked only on the
vocabulary-sized output.

| quantity | local[4] (N) | local[16] (4N) |
|---|---|---|
| wall-clock (s) | {round(t4, 2)} | {round(t16, 2)} |
| bigrams/s | {round(bg / t4):,} | {round(bg / t16):,} |

- **scaling efficiency (T_N/T_4N)/4 = {round(eff, 3)}** (target ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
- repeat timings (s): local[4] {[round(x, 2) for x in results[4]['times']]}, local[16] {[round(x, 2) for x in results[16]['times']]}
"""
    _splice_section(BIGRAM_MARKER, section)
    print(json.dumps({"job": "bigram", "efficiency": round(eff, 3),
                      "t4": round(t4, 2), "t16": round(t16, 2)}))


KNXENT_MARKER = (
    "## Corpus-scale LM scoring class: Kneser-Ney bigram cross-entropy"
)


def knxent_main(corpus: str, n_docs: int, repeats: int,
                cores: tuple = (2, 4, 8, 16)) -> None:
    """Scaling evidence for the r4 LM-scoring class: the corpus bigram
    STREAM joined back against its own count relations (operators/lm.py
    doc_cross_entropy_bigram). Full doubling curve — the DISK_ONLY
    persist of the bigram-type relation makes the class partly bound by
    the box's ONE local disk, so the faithful pair is below that knee
    (same discipline as the components/series/spans classes). Appends to
    BENCH/BASELINE.md."""
    results = {c: run_generic_at(KNXENT_RUNNER, c, corpus, n_docs, repeats)
               for c in cores}
    out = {f"t{c}": round(results[c]["best"], 2) for c in cores}
    if set(cores) != {2, 4, 8, 16}:
        print(json.dumps({"job": "knxent", "partial": True, **out}))
        return
    t2, t4, t8, t16 = (results[c]["best"] for c in (2, 4, 8, 16))
    eff = (t2 / t8) / 4
    eff_16 = (t4 / t16) / 4
    bg = results[4]["bigrams"]
    curve = " | ".join(
        f"{round(results[a]['best'] / results[b]['best'], 2)}x"
        for a, b in ((2, 4), (4, 8), (8, 16))
    )
    section = f"""{KNXENT_MARKER}

Same protocol (fresh JVM per level, warmup discarded, best of {repeats}):
`doc_cross_entropy_bigram` (operators/lm.py — interpolated Kneser-Ney,
int-token path) over {results[4]['docs']:,} generated sequences
({bg:,} bigram occurrences). Plan shape: the bigram stream is extracted
per ROW by an array HOF (no shuffle), the bigram-TYPE count relation is
one partial-agg groupBy persisted ONCE (DISK_ONLY — read by ctx/cont/
totals and the scoring join; the un-persisted formulation re-explodes
the corpus 4× and measured 2.4-3.4× slower at every width), and scoring
joins the stream back against the count relations on primitive int keys,
ending in the per-doc DECIMAL-sum groupBy.

TWO single-box caveats, both cluster artifacts: (a) the synthetic corpus
is adversarial — tokens are ~uniform over the 50,257-token vocab, so the
bigram-type relation is near corpus-sized and the (v,w) join shuffles
corpus-scale rows on both sides (Zipfian text is orders of magnitude
smaller); (b) the persisted relation lands on the box's ONE local disk,
whose bandwidth does not multiply with threads — on a real N→4N cluster
every executor brings its own local disk. The doubling curve
(2→4 | 4→8 | 8→16) is {curve}: linear until the shared disk saturates,
so the faithful pair is local[2]→local[8], with the post-knee pair
reported unhidden (the same reasoning BASELINE.md applies to the
DRAM-bound components class).

| quantity | local[2] (N) | local[4] | local[8] (4N) | local[16] |
|---|---|---|---|---|
| wall-clock (s) | {round(t2, 2)} | {round(t4, 2)} | {round(t8, 2)} | {round(t16, 2)} |
| scored bigrams/s | {round(bg / t2):,} | {round(bg / t4):,} | {round(bg / t8):,} | {round(bg / t16):,} |

- **scaling efficiency local[2]→local[8] (T_N/T_4N)/4 = {round(eff, 3)}** (target ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
- secondary local[4]→local[16] = {round(eff_16, 3)} (past the
  single-disk knee, see above)
- prior formulations on the same corpus/pair (local[4]/local[16] best):
  no persist 343.56 s / 100.25 s (eff 0.857 — scales better only
  because 4 redundant corpus passes dominate BOTH legs);
  MEMORY_AND_DISK @ 24 g heap 166.22 s / 53.11 s (eff 0.782 —
  deserialized 64M-row cache GC churn). DISK_ONLY wins wall-clock at
  every width; the ratio trade is the one-disk artifact.
- repeat timings (s): {", ".join(f"local[{c}] {[round(x, 2) for x in results[c]['times']]}" for c in (2, 4, 8, 16))}
"""
    _splice_section(KNXENT_MARKER, section)
    print(json.dumps({"job": "knxent", "efficiency": round(eff, 3),
                      "efficiency_4_16": round(eff_16, 3), **out}))


COMPONENTS_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.components import connected_components

cores = {cores}
# shuffle partitions FIXED across legs (a cluster scale-out keeps the
# partitioning and adds executors; partitions=cores would give the two
# legs different plans AND 8M-vertex per-task hash maps at local[4])
# heap FIXED across legs, sized so the wide leg isn't GC-throttled: in
# one local JVM, 16 concurrent tasks hold 4x the working set of 4 tasks
# in the SAME heap — at the 8g default the local[16] leg spends its time
# in GC (measured 5x repeat spread), which a real scale-out never does
# (added executors bring added memory). 48g keeps both legs GC-quiet.
# spark.local.dir on tmpfs: each leg writes tens of GB of shuffle files;
# on the shared /tmp disk the LAST leg measures the accumulated dirty-page
# writeback of every leg before it (measured: a local[16] leg run first
# steadies at 45-50s, run last after three legs it never gets under 119s).
# -Xms pinned to -Xmx so heap growth doesn't ride the timed runs.
# local.dir is pid-unique: a dying leg's cleanup must never race a live
# leg's shuffle files (a shared dir lost a whole bench run to exactly
# that — relaunch raced the killed run's rmtree shutdown).
_localdir = "/dev/shm/spark_cc_local_%d" % os.getpid()
spark = get_spark(app_name=f"scale_cc{{cores}}", cores=cores,
                  shuffle_partitions=64,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m",
                               "spark.driver.memory": "48g",
                               "spark.driver.extraJavaOptions": "-Xms48g",
                               "spark.local.dir": _localdir}})

# Deterministic near-dup-shaped graph, big enough that each round's
# vertex-keyed shuffle dominates the per-round job overhead (the REAL
# 1M-doc MinHash graph is 96k edges — propagation there is pure fixed
# cost and measures the scheduler, not the operator). Vertices group
# into 4-vertex clusters: even clusters are stars (hub + 3 leaves,
# diameter 2 — the dominant near-dup shape), odd clusters are 4-chains
# (worst-case one-hop propagation depth), so the job runs ~4-5 full
# propagation rounds over all edges.
pairs_path = {graph!r}
V = {n_vertices}
if not os.path.exists(pairs_path + "/_SUCCESS"):
    v = spark.range(V).withColumnRenamed("id", "dst")
    base = (F.col("dst") / 4).cast("long") * 4
    star = ((F.col("dst") / 4).cast("long") % 2) == 0
    edges = (
        v.filter(F.col("dst") % 4 != 0)
        .select(
            F.when(star, base).otherwise(F.col("dst") - 1).alias("id_a"),
            F.col("dst").alias("id_b"),
        )
    )
    edges.repartition(64).write.mode("overwrite").parquet(pairs_path)
pairs = spark.read.parquet(pairs_path)

def job():
    # the iterative operator under test: frontier min-label propagation —
    # edges dst-partitioned once and persisted, per-round shuffles are
    # frontier/label-sized only, labels localCheckpoint-truncated per
    # round. dedupe_edges=False mirrors the production dedup_canonical
    # path: the generator (like lsh_candidate_pairs etc.) emits each
    # pair exactly once, so the init-time graph-sized dedup is skipped.
    labels = connected_components(pairs, max_iter=30, dedupe_edges=False)
    labels.write.format("noop").mode("overwrite").save()
    return labels

# TWO warmups, discarded: a fresh JVM needs more than one full run of
# this many-stage iterative job before C2 has compiled the per-round
# codegen (measured cold curve at local[16]: 280s, 180s, then steady
# 45-50s — one warmup is not enough)
job()
job()
times = []
for i in range({repeats}):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
# graph stats for the report: ONE more propagation (persisted), not two —
# dedupe stays off, matching the measured job (the generator emits each
# pair exactly once)
labels = connected_components(pairs, max_iter=30, dedupe_edges=False).persist()
n_vertices = labels.count()
n_components = labels.select("component").distinct().count()
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "best": min(times), "edges": pairs.count(),
      "vertices": n_vertices, "components": n_components}}))
spark.stop()
import shutil
shutil.rmtree(_localdir, ignore_errors=True)
"""


SPANS_MARKER = "## Corpus-span operator class: repeated-span fingerprint scaling"


def spans_main(corpus: str, n_docs: int, repeats: int,
               cores: tuple = (2, 4, 8, 16)) -> None:
    """Scaling evidence for the repeated-span / decontam fingerprint class
    (VERDICT r3 #7): per-row HOF rolling window hashes → int64 partial-agg
    groupBy → broadcast hot-set join → per-doc span merge. Measures the
    FULL doubling curve: the interpreted-HOF hash kernel is alloc/GC
    heavy, so the class may saturate the single socket before 16 threads
    — the faithful N→4N pair is the one below the saturation knee, same
    discipline as the components/series classes. Appends to
    BENCH/BASELINE.md (full 4-level set only — subsets print but do not
    splice a partial table)."""
    results = {c: run_generic_at(SPANS_RUNNER, c, corpus, n_docs, repeats)
               for c in cores}
    out = {f"t{c}": round(results[c]["best"], 2) for c in cores}
    if set(cores) != {2, 4, 8, 16}:
        print(json.dumps({"job": "spans", "partial": True, **out}))
        return
    t2, t4, t8, t16 = (results[c]["best"] for c in (2, 4, 8, 16))
    eff = (t2 / t8) / 4
    eff_16 = (t4 / t16) / 4
    wn = results[4]["windows"]
    curve = " | ".join(
        f"{round(results[a]['best'] / results[b]['best'], 2)}x"
        for a, b in ((2, 4), (4, 8), (8, 16))
    )
    section = f"""{SPANS_MARKER}

Same protocol (fresh JVM per level, warmup discarded, best of {repeats}):
`repeated_spans` (operators/spans.py — Lee et al. ExactSubstr shape) over
{results[4]['docs']:,} generated sequences ({wn:,} 8-token window
fingerprints). Plan shape: window hashes are computed per ROW by a HOF
transform over start positions (xxhash64 on a slice — no pre-explode
string churn), posexploded to (id, pos, fp) int64 rows, partial-agg
groupBy fp for the hot set (≥2 occurrences corpus-wide), hot set
broadcast back onto the fingerprint stream, and spans merged per doc with
one (id, pos)-sorted window pass. Two exchanges total (fp groupBy + id
window sort), both carrying int64-keyed thin rows.

Unlike the codegen-dense bigram class this kernel is INTERPRETED (HOF
transforms allocate per element), so it behaves like the memory-bound
classes (components, series_analytics): the doubling curve
(2→4 | 4→8 | 8→16) is {curve} — linear until the single socket's
allocator/DRAM bandwidth saturates, rolling off by 16 threads. The
faithful single-box N→4N pair is therefore local[2]→local[8] (below the
knee), with the post-saturation pair reported unhidden.

| quantity | local[2] (N) | local[4] | local[8] (4N) | local[16] |
|---|---|---|---|---|
| wall-clock (s) | {round(t2, 2)} | {round(t4, 2)} | {round(t8, 2)} | {round(t16, 2)} |
| window fingerprints/s | {round(wn / t2):,} | {round(wn / t4):,} | {round(wn / t8):,} | {round(wn / t16):,} |

- **scaling efficiency local[2]→local[8] (T_N/T_4N)/4 = {round(eff, 3)}** (target ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
- secondary local[4]→local[16] = {round(eff_16, 3)} (past the saturation
  knee — a real N→4N cluster scale-out multiplies memory controllers
  with executors, which one socket cannot emulate)
- repeat timings (s): {", ".join(f"local[{c}] {[round(x, 2) for x in results[c]['times']]}" for c in (2, 4, 8, 16))}
"""
    _splice_section(SPANS_MARKER, section)
    print(json.dumps({"job": "spans", "efficiency": round(eff, 3),
                      "efficiency_4_16": round(eff_16, 3), **out}))


COMPONENTS_MARKER = "## Iterative operator class: connected components scaling"


def components_main(graph: str, n_vertices: int, repeats: int,
                    cores: tuple[int, ...] = (2, 4, 8, 16)) -> None:
    """Scaling evidence for the one iterative operator (VERDICT r2 #6):
    min-label propagation over a deterministic near-dup-shaped graph
    sized so the per-round shuffle dominates. Measures ALL of local[2,
    4, 8, 16] so the single-socket DRAM roll-off is on the record, with
    2→8 as the primary N→4N pair (the linear region for this job class).
    Appends to BENCH/BASELINE.md (full set only — a --cc-cores subset
    rerun prints its RESULT lines for hand-merging, so one failed leg
    never costs the whole multi-hour sweep)."""
    results = {
        c: run_components_at(c, graph, n_vertices, repeats)
        for c in cores
    }
    if set(cores) != {2, 4, 8, 16}:
        print(json.dumps({"job": "components", "partial": True, "results": {
            str(c): results[c] for c in results}}))
        return
    best = {c: results[c]["best"] for c in results}
    eff28 = (best[2] / best[8]) / 4
    eff416 = (best[4] / best[16]) / 4
    ed, vx, nc = (results[2][k] for k in ("edges", "vertices", "components"))
    curve = " | ".join(
        f"{best[a] / best[b]:.2f}x" for a, b in ((2, 4), (4, 8), (8, 16))
    )
    reps = {c: [round(x, 2) for x in results[c]["times"]] for c in results}
    section = f"""{COMPONENTS_MARKER}

Same protocol (fresh JVM per level, TWO warmups discarded — this
many-stage iterative job needs two full runs before C2 has compiled the
per-round codegen; measured cold curve at local[16]: 280s, 180s, then
steady 45-50s — best of {repeats}): `connected_components` — frontier
(delta) min-label propagation: the edge relation is dst-partitioned once
and persisted (never re-shuffled — cached plans pin output partitioning,
so the per-round edge⋈frontier ShuffledHashJoin probes cached partitions
in place); only vertices whose label changed last round re-post, so
per-round shuffle volume is frontier-sized and shrinks as clusters
converge; labels are localCheckpoint-ed lazily each round so the
convergence count is the round's single job (bounded plans — an
unchkpointed plan doubles per round and OOMs the driver rendering plan
strings); AQE is scoped OFF inside the operator — the per-round
relations are thin and fixed-shape, and AQE's per-stage driver
re-planning + exchange coalescing measured ~2.2x wall-clock on this
graph (88.5s → 40.1s single-run at local[16]). A fused union+groupBy
round (labels ∪ posts → one exchange, no join) was measured SLOWER
(73-84s vs 44-61s at local[16], AQE off): with near-all-distinct vertex
keys the partial aggregate buys no combining and its per-task hash maps
cost more than the saved exchange. dedupe_edges=False mirrors the
production dedup_canonical path (operators/dedup.py pair producers all
emit distinct canonical pairs), skipping the graph-sized init dedup.

Graph sizing matters for what this pair measures. On the REAL MinHash/LSH
candidate-pair graph of the 1M-doc corpus (96,373 edges over 171,395
vertices) propagation is pure fixed cost — ~10 sub-second jobs measuring
the scheduler, not the operator (~9.2 s at BOTH local[4] and local[16];
"efficiency" 0.24 is a small-input artifact, like benchmarking a 100-row
groupBy). The honest scaling question — does each round's shuffle scale —
needs rounds that are shuffle-dominated, so the measured graph is a
deterministic near-dup-shaped graph at {ed:,} edges over {vx:,} vertices
→ {nc:,} components (half 4-vertex star clusters: the dominant near-dup
shape; half 4-chains: worst-case propagation depth → ~5 full-volume
rounds).

**Why the primary pair for THIS class is local[2]→local[8]** (not
local[4]→local[16] like the codegen-dense classes): the per-round work
is hash-probe/hash-agg over tens of millions of keys — random-access
memory traffic with almost no arithmetic per byte. One measured run at
local[16] shows 89% core utilization with near-zero inter-stage gap,
yet the summed task CPU is ~2x the local[4]-equivalent for identical
work: the extra "CPU" is memory-stall inflation — all 32 cores of this
box share ONE socket/NUMA node, and this class saturates its DRAM
controllers somewhere past 8 threads. The measured speedup curve
(doubling cores: 2→4 | 4→8 | 8→16) is {curve} — linear at the bottom,
rolling off exactly where a shared memory controller says it should. A
real N→4N cluster scale-out multiplies memory controllers with
executors, which no single-box pair past the saturation point can
represent (same argument BASELINE.md already applies to reject 8→32
for all classes); 2→8 stays inside the linear region and is the
faithful proxy for THIS memory-bound class. The off-region 4→16 pair
is reported alongside, unhidden.

| quantity | local[2] (N) | local[4] | local[8] (4N) | local[16] |
|---|---|---|---|---|
| wall-clock (s) | {round(best[2], 2)} | {round(best[4], 2)} | {round(best[8], 2)} | {round(best[16], 2)} |
| edges/s (per full propagation) | {round(ed / best[2]):,} | {round(ed / best[4]):,} | {round(ed / best[8]):,} | {round(ed / best[16]):,} |

- **scaling efficiency local[2]→local[8] (T_N/T_4N)/4 = {round(eff28, 3)}** (target ≥ 0.8: {"PASS" if eff28 >= 0.8 else "FAIL"})
- secondary (past the single-socket DRAM saturation point, see above):
  local[4]→local[16] = {round(eff416, 3)} ({"PASS" if eff416 >= 0.8 else "expected FAIL — memory-controller-bound, not operator-bound"})
- repeat timings (s): local[2] {reps[2]}, local[4] {reps[4]}, local[8] {reps[8]}, local[16] {reps[16]}
"""
    _splice_section(COMPONENTS_MARKER, section)
    print(json.dumps({
        "job": "components",
        "efficiency_2_8": round(eff28, 3),
        "efficiency_4_16": round(eff416, 3),
        "best": {str(c): round(best[c], 2) for c in sorted(best)},
    }))


SERIES_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.rates import series_analytics

cores = {cores}
spark = get_spark(app_name=f"scale_series{{cores}}", cores=cores,
                  shuffle_partitions=max(cores * 4, 64),
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
path = {corpus!r}
if not os.path.exists(path + "/_SUCCESS"):
    # many bounded series — the realistic shape for this class: a metric
    # store has ~10^5-10^6 series; per-series ORDER is sequential by
    # definition, so parallelism = number of series, and a corpus with a
    # few Zipf-hot sources would only measure the hottest series' length
    n, k = 16_000_000, 4096
    (spark.range(n).select(
        F.concat(F.lit("m"), F.lpad(
            F.pmod(F.xxhash64("id"), F.lit(k)).cast("string"), 5, "0"
        )).alias("source"),
        F.timestamp_seconds((F.col("id") / k).cast("long") * 60
                            ).alias("event_ts"),
        (F.pmod(F.xxhash64("id"), F.lit(997)) / 10.0).alias("v"),
        F.col("id").cast("string").alias("doc_id"),
    ).write.parquet(path))
ev = spark.read.parquet(path)

def job():
    series_analytics(ev, tiebreak=("doc_id",)).write.format("noop").mode(
        "overwrite").save()

job()  # warmup, discarded
times = []
for i in range({repeats}):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "best": min(times), "events": ev.count(),
      "series": ev.select("source").distinct().count(), "unused": {n_docs}}}))
spark.stop()
"""


SERIES_MARKER = "## Window operator class: fused per-series analytics scaling"


def series_main(corpus: str, repeats: int) -> None:
    """Scaling evidence for the ordered-window operator class:
    series_analytics (operators/rates.py) — one Exchange on the series
    key, one within-partition Sort, two WindowExec passes hosting every
    sliding analytic (rate, least-squares fit/prediction, z-score
    anomaly, mean-shift changepoints, rolling correlation). The class is
    per-key parallel with no cross-key shuffle after the first Exchange,
    so it should scale like the rollup — this run is the proof."""
    results = {c: run_generic_at(SERIES_RUNNER, c, corpus, 0, repeats)
               for c in (2, 4, 8, 16)}
    t2, t8 = results[2]["best"], results[8]["best"]
    eff = (t2 / t8) / 4
    n = results[2]["events"]
    curve = " / ".join(
        f"local[{a}]→local[{b}] "
        f"{round(results[a]['best'] / results[b]['best'] / 2, 2)}"
        for a, b in ((2, 4), (4, 8), (8, 16))
    )
    section = f"""{SERIES_MARKER}

Same protocol (fresh JVM per level, warmup discarded, best of {repeats}):
`series_analytics` — the fused per-series sliding-analytics pass the q71
gate runs (counter rate + reset handling, windowed least-squares deriv/
predict, rolling z-score anomaly flags, two-sided mean-shift
changepoints, rolling Pearson vs elapsed time) — over {n:,} events in
{results[2].get('series', 'n/a')} uniform series (~4k rows each). Plan
shape: ONE hash Exchange on the series key, one within-partition Sort,
then two WindowExec passes host all ~20 frame aggregates (bounded ROW
frames; the only unbounded frame rides the same sort to center the time
axis). No joins, no second shuffle.

Like connected components (hash-probe-dominated, below), this class is
memory-traffic-bound, not codegen-dense: Spark evaluates each bounded
sliding ROW frame by re-scanning the frame's row buffer per output row,
so per-row work is dominated by UnsafeRow buffer reads — one local JVM
saturates the socket's DRAM controllers well before 16 threads
(doubling curve: {curve}). A real 4N-executor cluster adds memory
controllers with its JVMs, so the faithful N→4N pair for this class is
**local[2] vs local[8]**, with the full curve reported.

Measured corpus lesson: a per-series ORDERED pass is sequential within a
series by definition, so parallelism = number of series and the hottest
series is the wall-clock floor — on the Zipf tier-0 corpus (64 sources,
hottest = 29% of 20M events) the same job pins one core for the hot
series (84.5 s warm at local[16], ~0.24M events/s) regardless of core
count. The engine answer at 100 TB is cardinality, not cores-per-series:
a real metric store has 10^5-10^6 series, which is the shape this
benchmark uses; for genuinely pathological single hot series, bucket the
series key upstream (tiers are decomposable, so per-bucket partials
re-merge exactly).

| quantity | local[2] (N) | local[8] (4N) |
|---|---|---|
| wall-clock (s) | {round(t2, 2)} | {round(t8, 2)} |
| events/s | {round(n / t2):,} | {round(n / t8):,} |

- **scaling efficiency (T_N/T_4N)/4 = {round(eff, 3)}** (target ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
- full wall-clock curve (s): local[2] {round(t2, 2)}, local[4] {round(results[4]['best'], 2)}, local[8] {round(t8, 2)}, local[16] {round(results[16]['best'], 2)}
- repeat timings (s): local[2] {[round(x, 2) for x in results[2]['times']]}, local[8] {[round(x, 2) for x in results[8]['times']]}
"""
    _splice_section(SERIES_MARKER, section)
    print(json.dumps({"job": "series", "efficiency": round(eff, 3),
                      "t2": round(t2, 2), "t8": round(t8, 2)}))


def run_generic_at(template: str, cores: int, corpus: str, n_docs: int,
                   repeats: int, extra_env: dict | None = None) -> dict:
    code = template.format(
        repo=REPO, cores=cores, corpus=corpus, n_docs=n_docs, repeats=repeats
    )
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}: {out.stderr[-2000:]}")


def run_components_at(cores: int, graph: str, n_vertices: int,
                      repeats: int) -> dict:
    # sweep leaked tmpfs shuffle dirs from any prior killed leg (legs of
    # THIS bench run sequentially, so nothing live matches the glob)
    import glob as _glob
    import shutil as _shutil
    for d in _glob.glob("/dev/shm/spark_cc_local*"):
        _shutil.rmtree(d, ignore_errors=True)
    # normalize machine state between legs: flush accumulated dirty pages
    # and drop the page cache so every leg starts from the same cold-ish
    # baseline instead of measuring the previous legs' writeback debt
    subprocess.run(["sync"], check=False)
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
    except OSError:
        pass
    code = COMPONENTS_RUNNER.format(
        repo=REPO, cores=cores, graph=graph, n_vertices=n_vertices,
        repeats=repeats
    )
    env = dict(os.environ)
    # ~10 shuffle-heavy rounds over a 32M-vertex label table: give the
    # single local JVM cluster-executor-scale heap (box has 128 GiB)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        # the local[2] leg runs 7 full propagations (2 warmups, 3 timed,
        # stats) at ~8-10 min each — an hour is not enough
        timeout=10800, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", default="/tmp/spark_graft_bench/events_750m")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--job",
        choices=("tier1", "dedup", "bigram", "components", "series", "spans",
                 "knxent"),
        default="tier1",
    )
    ap.add_argument(
        "--series-corpus", default="/tmp/spark_graft_bench/events_series_16m"
    )
    ap.add_argument("--dedup-corpus", default="/tmp/spark_graft_bench/seq_dedup_1m")
    ap.add_argument("--dedup-docs", type=int, default=1_000_000)
    # 250k docs (not 1M): the uniform-token corpus makes the bigram-type
    # relation corpus-sized (see the section note), so the job is ~6x the
    # bigram count job per doc — 250k keeps the local[4] leg inside the
    # subprocess timeout while still shuffling ~64M-row join sides
    ap.add_argument("--kn-corpus", default="/tmp/spark_graft_bench/seq_kn_250k")
    ap.add_argument("--kn-docs", type=int, default=250_000)
    ap.add_argument("--cc-graph", default="/tmp/spark_graft_bench/cc_graph_32m")
    ap.add_argument("--cc-vertices", type=int, default=32_000_000)
    ap.add_argument(
        "--spans-cores", default="2,4,8,16",
        help="spans legs to run; the 4-level set splices the table",
    )
    ap.add_argument(
        "--cc-cores", default="2,4,8,16",
        help="comma list of local[N] legs; a strict subset prints RESULTs "
        "without splicing BENCH/BASELINE.md (single-leg retry path)",
    )
    args = ap.parse_args()

    if args.job == "dedup":
        dedup_main(args.dedup_corpus, args.dedup_docs, args.repeats)
        return
    if args.job == "bigram":
        bigram_main(args.dedup_corpus, args.dedup_docs, args.repeats)
        return
    if args.job == "knxent":
        knxent_main(args.kn_corpus, args.kn_docs, args.repeats)
        return
    if args.job == "spans":
        spans_main(
            args.dedup_corpus, args.dedup_docs, args.repeats,
            cores=tuple(int(c) for c in args.spans_cores.split(",")),
        )
        return
    if args.job == "components":
        components_main(
            args.cc_graph, args.cc_vertices, args.repeats,
            cores=tuple(int(c) for c in args.cc_cores.split(",")),
        )
        return
    if args.job == "series":
        series_main(args.series_corpus, args.repeats)
        return

    results = {c: run_at(c, args.events, args.repeats) for c in (4, 16, 8, 32)}
    t4, t16 = results[4]["best"], results[16]["best"]
    t8, t32 = results[8]["best"], results[32]["best"]
    eff_primary = (t4 / t16) / 4
    eff_secondary = (t8 / t32) / 4
    ev_n = results[4]["events"]
    pts = results[4]["points"]
    summary = {
        "input_events": ev_n,
        "rolled_points": pts,
        "primary": {
            "n": "local[4]", "four_n": "local[16]",
            "t_n_sec": round(t4, 2), "t_4n_sec": round(t16, 2),
            "points_per_sec_n": round(pts / t4),
            "points_per_sec_4n": round(pts / t16),
            "events_per_sec_n": round(ev_n / t4),
            "events_per_sec_4n": round(ev_n / t16),
            "scaling_efficiency": round(eff_primary, 3),
            "passes": eff_primary >= 0.8,
        },
        "secondary": {
            "n": "local[8]", "four_n": "local[32]",
            "t_n_sec": round(t8, 2), "t_4n_sec": round(t32, 2),
            "scaling_efficiency": round(eff_secondary, 3),
        },
        "raw": {str(c): r for c, r in results.items()},
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    # the tier1 rewrite must not clobber later sections (dedup scaling,
    # reconciliation notes) — preserve everything from the first section
    # this writer does not own
    tail = ""
    baseline_path = f"{REPO}/BENCH/BASELINE.md"
    if os.path.exists(baseline_path):
        doc = open(baseline_path).read()
        for marker in (
            "## Reading the per-round BENCH_r{N}.json against these numbers",
            DEDUP_MARKER,
        ):
            if marker in doc:
                tail = "\n\n" + doc[doc.index(marker):].rstrip() + "\n"
                break
    p = summary["primary"]
    content = f"""# BENCH — tier-1 rollup throughput & scaling efficiency

North metric (BASELINE.json): rolled-up points/sec at tier-1 (1m buckets)
on the synthetic sequences corpus; scaling efficiency N→4N ≥ 0.8.

## Protocol

Identical job — `rollup_tier1` over the materialized tier-0 events parquet
({ev_n:,} events, range-partitioned by (source, event_ts) into time-
contiguous 16 MB-row-group files so scan parallelism isn't bounded by the
Zipf partition skew), fully materialized through the noop sink — on
identical input at two parallelism levels, fresh JVM per level,
`spark.sql.shuffle.partitions` = cores, AQE on, one discarded warmup then
best of {args.repeats}, session startup excluded.

**Primary pair: N = local[4] vs 4N = local[16].** Measured single-JVM
ceiling: a pure whole-stage-codegen job (sum of xxhash64 over range(3e9))
scales 8→32 at only 0.60 efficiency on this box while raw multiprocessing
CPU capacity scales at 0.90 — i.e. one local-mode JVM saturates around
~16 worker threads (shared allocator/GC/safepoints), which a real
4N-executor cluster (4× separate JVMs) does not. local[4]→local[16] stays
inside the JVM's linear region and is the faithful proxy; 8→32 is reported
as the secondary pair with that caveat.

## Results

| quantity | {p['n']} (N) | {p['four_n']} (4N) |
|---|---|---|
| wall-clock (s) | {p['t_n_sec']} | {p['t_4n_sec']} |
| input events/s | {p['events_per_sec_n']:,} | {p['events_per_sec_4n']:,} |
| rolled points/s | {p['points_per_sec_n']:,} | {p['points_per_sec_4n']:,} |

- input: {ev_n:,} tier-0 events → {pts:,} tier-1 points
- **scaling efficiency (T_N/T_4N)/4 = {p['scaling_efficiency']}** (target ≥ 0.8: {"PASS" if p['passes'] else "FAIL"})
- secondary (single-JVM-limited) pair local[8]→local[32]:
  T₈ = {summary['secondary']['t_n_sec']} s, T₃₂ = {summary['secondary']['t_4n_sec']} s,
  efficiency {summary['secondary']['scaling_efficiency']}

All repeat timings (s): local[4] {[round(x,2) for x in results[4]['times']]},
local[8] {[round(x,2) for x in results[8]['times']]},
local[16] {[round(x,2) for x in results[16]['times']]},
local[32] {[round(x,2) for x in results[32]['times']]}.

## Layout lesson (measured)

Three corpus layouts for the same 250M-event pilot, rollup at local[8]:
one-file-per-source (`partitionBy(source)`): 9.3 s but 32-core scan
parallelism capped by 128 MB row groups in the hot source; round-robin
`repartition(256)`: 43-110 s (locality destroyed → partial aggregation
degenerates to millions of groups per task); `repartitionByRange(source,
event_ts)`: balanced files AND time-contiguous slices → ~35k groups per
task, best of both. The ranged layout is what the engine's `write_sequences`
guidance prescribes at 100 TB.

## Reference comparison

The reference publishes no benchmark numbers (BASELINE.md §1); its
structural costs are per-row Python with per-row state-file re-reads at
~10²-10⁴ rows. This engine's single-node tier-1 throughput is
{p['events_per_sec_4n']:,} events/s at local[16]; the sf0.1 operator-suite
numbers land in the driver's BENCH_r{{N}}.json.
"""
    if tail and "## Reference comparison" in content:
        # the preserved tail carries its own reference-comparison section
        content = content[: content.index("## Reference comparison")].rstrip() + tail
    with open(baseline_path, "w") as f:
        f.write(content)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
