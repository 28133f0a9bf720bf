#!/usr/bin/env python
"""Ingest-throughput benchmark: synthetic WikiData-shaped dump -> the
full two-phase build (extract 9 tables + post-process to final cities).

The reference's only published performance numbers are operational
(README.md:15-19: 6-8 h for the full ~100M-entity dump on ~4 cores =
~4k entities/s ingest; ~30 min post). This bench builds a dump with a
realistic routing mix (most entities are NOT geographic and must be
pruned cheaply — the reference's class-set early-exit, our broadcast
semi-join) and measures end-to-end entities/sec on local[N].

Usage: python scripts/bench_ingest.py [n_entities] [workdir]
Prints one JSON line: {"entities": N, "ingest_sec": ..., "post_sec":
..., "entities_per_sec": ...}.
"""

from __future__ import annotations

import bz2
import json
import os
import random
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ingest_bench"

CLASS_SETS = {
    "territorial_entities": ["QTE"],
    "human_settlements": ["QCITY"],
    "excluded": ["QEXC"],
    "excluded_settlements": ["QEXCS"],
    "second_level_admin_div": ["Q2ND"],
    "languages": ["QLANG"],
}

LANGS = ["en", "de", "fr", "eo", "zh-hans"]


def _ent_stmt(qid, quals=None):
    s = {"mainsnak": {"snaktype": "value", "datavalue": {"value": {"id": qid}}}}
    if quals:
        s["qualifiers"] = quals
    return s


def _t(time_s):
    return {"snaktype": "value", "datavalue": {"value": {"time": time_s, "timezone": 0}}}


def _labels(rng, eid):
    return {
        lang: {"language": lang, "value": f"{eid}-{lang}"}
        for lang in rng.sample(LANGS, rng.randint(1, 4))
    }


def make_dump(path: str, n: int) -> None:
    rng = random.Random(42)
    n_countries = max(n // 100, 5)
    n_states = max(n // 50, 10)
    with bz2.open(path, "wt") as f:
        f.write("[\n")
        for i in range(n):
            eid = f"Q{i}"
            r = rng.random()
            if i < n_countries:  # countries first so others can reference
                doc = {
                    "id": eid,
                    "claims": {
                        "P297": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": f"c{i}"}}}],
                        "P37": [_ent_stmt(f"Q{n - 1 - (i % 50)}")],
                    },
                    "labels": _labels(rng, eid),
                }
            elif i >= n - 50:  # languages at the tail
                doc = {
                    "id": eid,
                    "claims": {
                        "P31": [_ent_stmt("QLANG")],
                        "P424": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": f"l{i}"}}}],
                    },
                }
            elif i < n_countries + n_states:  # 2nd-level TEs
                doc = {
                    "id": eid,
                    "claims": {
                        "P31": [_ent_stmt("QTE"), _ent_stmt("Q2ND")],
                        "P300": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": f"s{i}"}}}],
                        "P131": [_ent_stmt(f"Q{rng.randrange(n_countries)}")],
                        "P37": [_ent_stmt(f"Q{n - 1 - (i % 50)}")],
                    },
                    "labels": _labels(rng, eid),
                }
            elif r < 0.10:  # settlements (cities)
                doc = {
                    "id": eid,
                    "claims": {
                        "P31": [_ent_stmt("QCITY")],
                        "P17": [_ent_stmt(f"Q{rng.randrange(n_countries)}", {"P580": [_t("+1995-01-01T00:00:00Z")]})],
                        "P131": [_ent_stmt(f"Q{n_countries + rng.randrange(n_states)}")],
                        "P1082": [
                            {
                                "mainsnak": {"snaktype": "value", "datavalue": {"value": {"amount": f"+{rng.randrange(1000, 9999999)}", "unit": "1"}}},
                                "qualifiers": {"P585": [_t(f"+20{rng.randrange(10, 24)}-01-01T00:00:00Z")]},
                            }
                        ],
                        "P625": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": {"latitude": rng.uniform(-90, 90), "longitude": rng.uniform(-180, 180)}}}}],
                    },
                    "labels": _labels(rng, eid),
                }
            else:  # non-geographic noise: pruned by class routing
                doc = {
                    "id": eid,
                    "claims": {"P31": [_ent_stmt(f"QOTHER{rng.randrange(100)}")]},
                    "labels": _labels(rng, eid),
                }
            f.write(json.dumps(doc) + (",\n" if i < n - 1 else "\n"))
        f.write("]\n")


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    dump = f"{WORK}/dump.json.bz2"
    if not os.path.exists(dump) or os.environ.get("REGEN"):
        make_dump(dump, N)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from geo_db_spark.pipeline import ingest
    from geo_db_spark.plans.geo_post import post_process
    from geo_db_spark.session import get_spark

    spark = get_spark("ingest_bench")
    # A small bench dump fits one 128MB split and would parse serially;
    # shrink the split size so the splittable-bz2 read parallelizes the
    # way a full-size dump does on default settings (the capability the
    # reference's serial decompressor lacks, SURVEY.md §2 A2).
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    t0 = time.perf_counter()
    tables = ingest(spark, dump, CLASS_SETS, out_dir=f"{WORK}/raw")
    ingest_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    finals = post_process(tables)
    n_cities = finals["cities"].count()
    post_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "entities": N,
                "ingest_sec": round(ingest_sec, 2),
                "post_sec": round(post_sec, 2),
                "entities_per_sec": round(N / ingest_sec),
                "final_cities": n_cities,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
