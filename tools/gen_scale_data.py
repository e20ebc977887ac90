"""Generate a builder-local scale-factor dataset for the SCALING.md
rehearsal (VERDICT r5 task #1).

The driver ships sf0.001/0.01/0.1 read-only; the 100 TB design claim
needs at least one measured DECADE of scaling beyond that, so this tool
synthesizes sf1 (and any other SF) with the SAME schemas and the same
per-SF scaling conventions the driver's generator observably uses
(profiled from the shipped decades):

* rows: customer 150k/SF, supplier 10k/SF, part 200k/SF, orders
  1.5M/SF, lineitem ~4.07 lines/order, events 1M/SF, documents
  50k/SF, embeddings 20k/SF (doc/embedding floors at 500 like the
  driver's sf<=0.01);
* spans FIXED across SF (density grows): events cover 30 days from
  2024-01-01, orders 1995-01-01..2001-08-01, shipdate = orderdate +
  1..95 days;
* users = 15k/SF (events-per-user constant => streaming state grows
  with SF, as it should for an honest state-size rehearsal);
* documents: per-lang 31-word vocabularies EXTRACTED from the driver's
  sf0.1 corpus (same tokens, same lang mix ~41% en / ~15% each
  zh fr es de, 20 sources, 8..100 words/doc), with a planted ~2.5%
  near-dup clone rate (8% word mutation) and ~0.2% exact dups so
  dedup-family outputs grow ~linearly like the shipped corpus;
* --vocab-mode growing (VERDICT r7 task #1): the fixed 31-word/lang
  vocabulary SATURATES as the corpus grows — random unrelated docs
  collide as near-dups by chance, so pair-grain outputs (fuzzy /
  ppjoin / winnow / triangle entries) grow quadratically BY DATA
  CONSTRUCTION, masking the operators' true scaling. In growing mode
  the per-lang vocabulary scales with the corpus (V = max(31,
  round(310·sf)) ≈ 31 words per 5k docs, matching the driver's sf0.1
  density) by suffixing the 31 base words with a generation index
  ('ship', 'ship1', 'ship2', …), keeping natural token shapes.
  Duplicate-group sizes then stay O(1) as SF grows — the corpus shape
  a real growing crawl has — so measured growth exponents reflect the
  OPERATORS, not vocabulary saturation. r9 (VERDICT r8 task #2):
  growing mode now also scales the PART-NAME vocabulary (48·10·sf
  adjective-noun-generation combos ≈ the sf0.1 density of ~42 parts
  per name) so the linkage family's exponents can be measured on a
  non-saturating corpus too;
* embeddings: 64-dim, 10 labels, label-clustered (center + noise,
  L2-normalized) — near-orthogonal bulk like the driver's geometry.

Everything is deterministic (xxhash64-seeded, no RNG state) and
generated server-side in Spark — generating sf1 (~6.1M lineitem) takes
well under a minute on local[32].

Usage:  python tools/gen_scale_data.py --sf 1 [--out DIR]
Default out: /root/repo/.scaledata/sf{sf} (gitignored).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

LANG_SHARES = [("en", 0.41), ("zh", 0.56), ("fr", 0.705), ("es", 0.855), ("de", 1.01)]


def _u(expr: str, salt: int) -> str:
    """Deterministic uniform[0,1) from a bigint expression."""
    return f"(abs(xxhash64({expr}, {salt})) % 1000000000) / 1000000000.0"


def _h(expr: str, salt: int, mod: int) -> str:
    return f"(abs(xxhash64({expr}, {salt})) % {mod})"


def _word_idx(n_vocab: int) -> str:
    """Vocab index for word k of a document: the seed's word stream,
    with mutated positions resampled from the doc's own stream."""
    return (
        f"CASE WHEN mut > 0.0 AND {_u('doc_id * 131 + k', 76)} < mut "
        f"THEN {_h('doc_id * 131 + k', 77, n_vocab)} "
        f"ELSE {_h('seed * 131 + k', 77, n_vocab)} END"
    )


def build(
    spark,
    sf: float,
    out: str,
    files: int,
    vocab_mode: str = "fixed",
    tables: set[str] | None = None,
) -> None:
    from pyspark.sql import functions as F

    def want(name: str) -> bool:
        return tables is None or name in tables

    os.makedirs(out, exist_ok=True)
    n_cust = max(int(150_000 * sf), 100)
    n_supp = max(int(10_000 * sf), 50)
    n_part = max(int(200_000 * sf), 200)
    n_orders = max(int(1_500_000 * sf), 1000)
    n_events = max(int(1_000_000 * sf), 1000)
    n_users = max(int(15_000 * sf), 15)
    n_docs = max(int(50_000 * sf), 500)
    n_emb = max(int(20_000 * sf), 500)

    def write(df, name, n_files=None):
        df.coalesce(n_files or files).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"  {name}: written")

    # fixed dims: copy verbatim (schema + contents are SF-invariant)
    for dim in ("region", "nation"):
        write(spark.read.parquet(f"{SF01}/{dim}.parquet"), dim, 1)

    if want("customer"):
        write(
            spark.range(n_cust).selectExpr(
                "id + 1 AS c_custkey",
                "concat('Customer#', lpad(CAST(id AS STRING), 9, '0')) AS c_name",
                f"CAST({_h('id', 11, 25)} AS INT) AS c_nationkey",
                f"CAST(round(-1000 + {_u('id', 12)} * 11000, 2) AS DOUBLE) AS c_acctbal",
                f"element_at(array('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',"
                f"'MACHINERY'), CAST({_h('id', 13, 5)} AS INT) + 1) AS c_mktsegment",
            ),
            "customer",
        )
    if want("supplier"):
        write(
            spark.range(n_supp).selectExpr(
                "id + 1 AS s_suppkey",
                "concat('Supplier#', lpad(CAST(id AS STRING), 9, '0')) AS s_name",
                f"CAST({_h('id', 21, 25)} AS INT) AS s_nationkey",
                f"CAST(round(-1000 + {_u('id', 22)} * 11000, 2) AS DOUBLE) AS s_acctbal",
            ),
            "supplier",
            1,
        )
    if want("part"):
        # part names: fixed mode uses the driver corpus's 8×6 = 48
        # adjective-noun combos at every SF (name groups then grow ∝ SF
        # — the SATURATING corpus that confounded the linkage family's
        # top-decade exponent, VERDICT r8 task #2). Growing mode keeps
        # BOTH linkage grains O(1): each ENTITY is one adjective-noun
        # combo in 10 generation-suffixed spellings ('large ring',
        # 'large ring1', …, 'large ring9' — within edit distance 2 of
        # their sort-order neighbors, so the window chains them), and
        # the COMBO pool grows ∝ SF via a family suffix on the
        # adjective ('large7 ring3') whose runs are thousands of rows
        # apart in sort order (never window-adjacent) and ≥3 edits
        # from other families at run boundaries. Name groups stay ~417
        # parts and entities ~4 170 parts at ANY SF — the shape a real
        # growing parts master has — so measured exponents reflect the
        # operators, not entity growth.
        if vocab_mode == "fixed":
            name_expr = (
                f"concat(element_at(array('large','hot','blue','old','cold','red',"
                f"'small','dark'), CAST({_h('id', 31, 8)} AS INT) + 1), ' ', "
                f"element_at(array('ring','bolt','plate','cap','tube','disk'), "
                f"CAST({_h('id', 32, 6)} AS INT) + 1))"
            )
        else:
            n_names = max(48, int(round(480 * sf)))
            idx = _h("id", 37, n_names)
            gen, combo = f"(({idx}) % 10)", f"CAST(({idx}) / 10 AS INT)"
            name_expr = (
                f"concat(element_at(array('large','hot','blue','old','cold','red',"
                f"'small','dark'), CAST(({combo}) % 8 AS INT) + 1), "
                f"CASE WHEN ({combo}) < 48 THEN '' "
                f"ELSE CAST(CAST(({combo}) / 48 AS INT) AS STRING) END, ' ', "
                f"element_at(array('ring','bolt','plate','cap','tube','disk'), "
                f"CAST(CAST(({combo}) / 8 AS INT) % 6 AS INT) + 1), "
                f"CASE WHEN ({gen}) = 0 THEN '' "
                f"ELSE CAST({gen} AS STRING) END)"
            )
        write(
            spark.range(n_part).selectExpr(
                "id + 1 AS p_partkey",
                f"{name_expr} AS p_name",
                f"concat('Brand#', CAST({_h('id', 33, 25)} + 1 AS STRING)) AS p_brand",
                f"element_at(array('ECONOMY','LARGE','STANDARD','MEDIUM','PROMO',"
                f"'SMALL'), CAST({_h('id', 34, 6)} AS INT) + 1) AS p_type",
                f"CAST({_h('id', 35, 50)} + 1 AS INT) AS p_size",
                f"CAST(round(900 + {_u('id', 36)} * 100, 2) AS DOUBLE) AS p_retailprice",
            ),
            "part",
        )

    span_days = 2404  # 1995-01-01 .. 2001-08-01
    orders = spark.range(n_orders).selectExpr(  # lazy plan; also reused by the lineitem builder below
        "id + 1 AS o_orderkey",
        f"CAST({_h('id', 41, n_cust)} + 1 AS BIGINT) AS o_custkey",
        f"element_at(array('O','P','F'), CAST({_h('id', 42, 3)} AS INT) + 1) "
        "AS o_orderstatus",
        f"CAST(round(1000 + {_u('id', 43)} * 499000, 2) AS DOUBLE) AS o_totalprice",
        f"CAST(date_add(DATE'1995-01-01', CAST({_h('id', 44, span_days)} AS INT))"
        " AS TIMESTAMP) AS o_orderdate",
        f"element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED',"
        f"'5-LOW'), CAST({_h('id', 45, 5)} AS INT) + 1) AS o_orderpriority",
    )
    if want("orders"):
        write(orders, "orders")

    li = (
        orders.selectExpr(
            "o_orderkey",
            "o_orderdate",
            f"sequence(1, CAST({_h('o_orderkey', 51, 7)} + 1 AS INT)) AS lns",
        )
        .select("o_orderkey", "o_orderdate", F.explode("lns").alias("l_linenumber"))
        .selectExpr(
            "o_orderkey AS l_orderkey",
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 52, n_part)} + 1 "
            "AS BIGINT) AS l_partkey",
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 53, n_supp)} + 1 "
            "AS BIGINT) AS l_suppkey",
            "l_linenumber",
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 54, 50)} + 1 AS DOUBLE) "
            "AS l_quantity",
            f"CAST(round(900 + {_u('o_orderkey * 31 + l_linenumber', 55)} "
            "* 104100, 2) AS DOUBLE) AS l_extendedprice",
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 56, 11)} AS DOUBLE) / 100"
            " AS l_discount",
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 57, 9)} AS DOUBLE) / 100 "
            "AS l_tax",
            f"element_at(array('A','N','R'), "
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 58, 3)} AS INT) + 1) "
            "AS l_returnflag",
            f"element_at(array('F','O'), "
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 59, 2)} AS INT) + 1) "
            "AS l_linestatus",
            f"CAST(date_add(CAST(o_orderdate AS DATE), "
            f"CAST({_h('o_orderkey * 31 + l_linenumber', 60, 95)} + 1 AS INT)) "
            "AS TIMESTAMP) AS l_shipdate",
        )
    )
    if want("lineitem"):
        write(li, "lineitem")

    if want("events"):
        write(
            spark.range(n_events).selectExpr(
                "id + 1 AS event_id",
                f"timestampadd(SECOND, CAST({_u('id', 61)} * 2592000 AS INT), "
                "TIMESTAMP'2024-01-01 00:00:00') AS ts",
                f"CAST({_h('id', 62, n_users)} + 1 AS BIGINT) AS user_id",
                f"element_at(array('view','click','purchase','signup','error'), "
                f"CAST({_h('id', 63, 5)} AS INT) + 1) AS event_type",
                f"CAST(round(-50.0 * ln(1.0 - {_u('id', 64)}), 2) AS DOUBLE) AS value",
                f"concat('{{\"k\": ', CAST({_h('id', 65, 100)} AS STRING), '}}') "
                "AS props",
            ),
            "events",
        )

    if want("documents"):
        # documents: per-lang vocab from the driver's own sf0.1 corpus
        vocab_rows = (
            spark.read.parquet(f"{SF01}/documents.parquet")
            .select("lang", F.explode(F.split("text", " ")).alias("w"))
            .where(F.col("w") != "")
            .distinct()
            .collect()
        )
        vocab: dict[str, list[str]] = {}
        for r in vocab_rows:
            vocab.setdefault(r["lang"], []).append(r["w"])
        for k in vocab:
            vocab[k] = sorted(vocab[k])

        def lang_case(col: str) -> str:
            return "CASE " + " ".join(
                f"WHEN {_u(col, 71)} < {cum} THEN '{lang}'"
                for lang, cum in LANG_SHARES[:-1]
            ) + f" ELSE '{LANG_SHARES[-1][0]}' END"

        vocab_arr = "CASE " + " ".join(
            "WHEN lang = '{}' THEN array({})".format(
                lang, ",".join(f"'{w}'" for w in vocab[lang])
            )
            for lang in sorted(vocab)
        ) + " END"
        # per-lang vocabulary size: fixed 31 (the driver corpus density)
        # or corpus-proportional so duplicate-group sizes stay O(1) as
        # SF grows (VERDICT r7 task #1 — the non-saturating corpus).
        # Word idx maps to base_word(idx % 31) + generation suffix
        # (idx // 31): 'ship', 'ship1', 'ship2', … — natural token
        # shapes, no giant literal arrays in the plan. With n_vocab=31
        # the suffix is always '' and the text is byte-identical to the
        # fixed-mode corpus.
        n_vocab = (
            31 if vocab_mode == "fixed" else max(31, int(round(310 * sf)))
        )

        def word(idx: str) -> str:
            return (
                f"concat(element_at({vocab_arr}, CAST(({idx}) % 31 AS INT)"
                f" + 1), CASE WHEN ({idx}) < 31 THEN '' "
                f"ELSE CAST(CAST(({idx}) / 31 AS INT) AS STRING) END)"
            )

        # seed: ~2.5% of docs clone an earlier doc's seed (then mutate
        # 8% of words), an additional ~0.2% clone with NO mutation
        # (exact dups)
        docs = (
            spark.range(n_docs)
            .selectExpr(
                "id AS doc_id",
                f"CASE WHEN {_u('id', 72)} < 0.027 AND id >= 50 "
                f"THEN id - 1 - {_h('id', 73, 49)} ELSE id END AS seed",
                f"CASE WHEN {_u('id', 72)} < 0.002 THEN 0.0 "
                f"WHEN {_u('id', 72)} < 0.027 THEN 0.08 ELSE -1.0 END AS mut",
                f"concat('src', CAST({_h('id', 74, 20)} AS STRING)) AS source",
            )
            .selectExpr(
                "doc_id",
                "seed",
                "mut",
                # lang follows the SEED so clones share a vocabulary
                f"{lang_case('seed')} AS lang",
                "source",
            )
            .selectExpr(
                "doc_id",
                "lang",
                "source",
                f"array_join(transform(sequence(1, CAST({_h('seed', 75, 93)} + 8 "
                f"AS INT)), k -> {word(_word_idx(n_vocab))}), ' ') "
                "AS text",
            )
            .selectExpr(
                "doc_id", "text", "lang", "source", "CAST(length(text) AS BIGINT) AS n_chars"
            )
        )
        write(docs, "documents")

    if want("embeddings"):
        # embeddings: 10 label clusters, center + noise, L2-normalized
        coord = (
            f"transform(sequence(0, 63), j -> "
            f"(({_h('CAST(id % 10 AS BIGINT) * 64 + j', 81, 2001)} - 1000) / 1000.0)"
            f" * 0.9 + (({_h('id * 64 + j', 82, 2001)} - 1000) / 1000.0))"
        )
        write(
            spark.range(n_emb)
            .selectExpr(
                "id AS vec_id",
                "CAST(id % 10 AS INT) AS label",
                f"{coord} AS raw",
            )
            .selectExpr(
                "vec_id",
                "transform(raw, x -> CAST(x / sqrt(aggregate(raw, 0.0d, "
                "(a, v) -> a + v * v)) AS FLOAT)) AS embedding",
                "label",
            )
            .select("vec_id", "embedding", "label"),
            "embeddings",
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument(
        "--vocab-mode",
        choices=("fixed", "growing"),
        default="fixed",
        help="'growing' scales the per-lang document vocabulary with "
        "the corpus (non-saturating corpus for pair-grain dedup "
        "scaling legs); 'fixed' replicates the driver's 31-word/lang "
        "density at every SF",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list to generate only a subset (region+nation are "
        "always written — the scaling probe reads them)",
    )
    args = ap.parse_args()
    sf_tag = ("%g" % args.sf)
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        ("nsv_" if args.vocab_mode == "growing" else "") + f"sf{sf_tag}",
    )
    from nyc_taxi_etl_spark.session import get_spark

    spark = get_spark("gen-scale-data")
    try:
        print(f"generating sf={args.sf} ({args.vocab_mode} vocab) -> {out}")
        build(
            spark,
            args.sf,
            out,
            args.files,
            vocab_mode=args.vocab_mode,
            tables=set(args.tables.split(",")) if args.tables else None,
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
