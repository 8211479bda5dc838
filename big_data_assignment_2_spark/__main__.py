"""CLI — the reference's three shell entry points (`prepare_data.sh`,
`index.sh`, `search.sh`, SURVEY.md §3) as one Spark-native command:

    python -m big_data_assignment_2_spark prepare --sf-dir ... --out /tmp/stage
    python -m big_data_assignment_2_spark index   --sf-dir ... --out /tmp/index
    python -m big_data_assignment_2_spark search  "neural networks" [--index /tmp/index]
    python -m big_data_assignment_2_spark bench

`search` with --index probes the persisted (term-bucketed) index; without
it, the index is built in-flight from the corpus — one lineage, still a
single Catalyst plan.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="big_data_assignment_2_spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("prepare", help="sample + normalize + stage (E1)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--n", type=int, default=1000)

    si = sub.add_parser("index", help="build + persist the inverted index (E2)")
    si.add_argument("--out", required=True)

    ss = sub.add_parser("search", help="BM25 top-k (E3)")
    ss.add_argument("query")
    ss.add_argument("--index", help="persisted index dir (from `index`)")
    ss.add_argument("-k", type=int, default=10)

    sub.add_parser("bench", help="run the headline bench suite")

    sub.add_parser("list", help="list every declared query/operator")

    sq = sub.add_parser("query", help="run any declared query by name")
    sq.add_argument("name")
    sq.add_argument("--limit", type=int, default=20,
                    help="max rows to print (the plan still fully runs)")

    se = sub.add_parser(
        "explain", help="print a declared query's physical plan (no run)")
    se.add_argument("name")
    se.add_argument("--mode", default="formatted",
                    choices=["simple", "extended", "formatted", "cost"])

    args = p.parse_args(argv)
    if args.cmd == "bench":
        import bench

        bench.main()
        return 0
    if args.cmd == "list":
        from .plans import all_queries

        for name in all_queries():
            print(name)
        return 0

    from .session import get_spark
    from .sources.io import load_table

    spark = get_spark(f"cli-{args.cmd}")
    try:
        if args.cmd == "prepare":
            from .operators.prepare import (prepare_documents, sample_corpus,
                                            stage_tsv)

            docs = load_table(spark, args.sf_dir, "documents")
            prepared = prepare_documents(sample_corpus(docs, n=args.n))
            stage_tsv(prepared, args.out)
            print(f"staged {prepared.count()} docs -> {args.out}")
        elif args.cmd == "index":
            from .operators.index import build_index
            from .operators.persist import write_index

            ix = build_index(load_table(spark, args.sf_dir, "documents"))
            write_index(ix, args.out)
            n_terms = ix["document_frequency"].count()
            print(f"indexed {n_terms} terms -> {args.out}")
        elif args.cmd == "search":
            from .operators.search import bm25_topk, search_documents

            if args.index:
                from .operators.persist import read_index

                ix = read_index(spark, args.index)
                result = bm25_topk(spark, args.query, ix["term_document"],
                                   ix["document_frequency"],
                                   ix["documents_info"], k=args.k)
            else:
                docs = load_table(spark, args.sf_dir, "documents")
                result = search_documents(spark, docs, args.query, k=args.k)
            for i, row in enumerate(result.collect(), 1):
                print(f"{i:2d}. doc {row['doc_id']}  score={row['score']:.6f}")
        elif args.cmd == "query":
            from .plans import all_queries

            qs = all_queries()
            if args.name not in qs:
                print(f"unknown query {args.name!r}; see `list`",
                      file=sys.stderr)
                return 2
            df = qs[args.name](spark, args.sf_dir)
            rows = df.collect()
            for row in rows[:args.limit]:
                print(tuple(row))
            print(f"-- {len(rows)} rows ({args.name})")
        elif args.cmd == "explain":
            from .plans import all_queries

            qs = all_queries()
            if args.name not in qs:
                print(f"unknown query {args.name!r}; see `list`",
                      file=sys.stderr)
                return 2
            # Note: declared queries whose BUILDER runs side effects
            # (persisted-store and *_live streaming rows) execute those
            # while constructing the DataFrame; the returned probe's plan
            # is still printed without collecting it.
            qs[args.name](spark, args.sf_dir).explain(mode=args.mode)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
