"""Link-graph ranking: fixed-iteration PageRank over an edge
DataFrame, integer-exact so runs are bit-identical across
partitionings and replayable by a DuckDB oracle.

The web-curation use (CommonCrawl-style corpus triage ranks HOSTS by
link authority and keeps high-rank domains) composes with
``quality_spark.llm.urls``: :func:`domain_link_edges` builds the
host→host edge list from documents, :func:`domain_pagerank` is the
one-call recipe. The core :func:`pagerank` is generic — any (src,
dst) edge frame works (the gate ranks the customer→supplier order
graph from the TPC-H tables).

Integer spec (the same bit-replayability discipline as
``llm/classifier.train_classifier``):

- total rank mass is ``total`` pico-units (default 1e12); the initial
  rank is ``total DIV N`` per node;
- with damping ``d = d_num/d_den`` (default 85/100), one iteration is

    r'(v) = (d_den − d_num)·total DIV (d_den·N)          -- teleport
          + (d_num · D) DIV (d_den · N)                  -- dangling
          + Σ_{u→v} (d_num · r(u)) DIV (d_den · out(u))  -- links

  where ``D = Σ r(u)`` over dangling nodes (no out-edges). Every
  quantity is a non-negative BIGINT, so Spark's ``div`` and DuckDB's
  ``//`` (both truncating) agree with floor; sums are order-free;
  floor makes the iteration leak ≤1 pico-unit per node per term —
  irrelevant for ranking, essential for exactness.
- bounds: ``d_num·r ≤ d_num·total ≤ 1e14`` and every per-node sum is
  bounded by the total mass, so nothing approaches int64 range as
  long as ``d_num·total < 2^62`` (validated).

100 TB shape: edges-with-outdegree is computed once and persisted;
each iteration is ONE shuffle (groupBy dst of the contribution join)
plus a metadata-sized dangling-mass aggregate (1 row, crossJoined
broadcast — the repo's established 1-row pattern); the rank state is
|V| rows (hosts — millions, not documents) and is
``localCheckpoint``ed per iteration to cut lineage exactly like
``llm/dedup.connected_components``. Fixed ``iters`` (no convergence
test) keeps the job count deterministic and the oracle unrollable.

Reference scope note: the reference engine (sparkutils/quality) has
no graph operators — this module is part of the beyond-reference
training-data-pipeline surface, per the round charter.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.blocks import release_local_checkpoint

__all__ = [
    "pagerank",
    "pagerank_oracle_sql",
    "domain_link_edges",
    "domain_pagerank",
    "hits",
    "hits_oracle_sql",
    "prepare_graph",
    "release_graph",
]


def prepare_graph(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dedup_edges: bool = True,
) -> tuple:
    """Materialize the (edges, nodes, n) prologue both :func:`pagerank`
    and :func:`hits` start from — normalized string endpoints, NULLs
    dropped, optional parallel-edge collapse, both frames
    localCheckpoint'ed and the node count taken. Pass the result as
    ``prepared=`` to run several rankings over ONE materialization of
    the graph (one distinct + one node scan instead of one per
    ranking); the caller then owns the checkpoints and must call
    :func:`release_graph` when every consumer's construction is done.
    Results are identical to the unshared path by construction — the
    same deduped edge set feeds the same iteration."""
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if dedup_edges:
        e = e.distinct()
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    return (e, nodes, nodes.count())


def release_graph(prepared: tuple) -> None:
    """Free the checkpoint blocks of a :func:`prepare_graph` result
    (checkpoint hygiene — see plans/blocks.py)."""
    e, nodes, _ = prepared
    release_local_checkpoint(e)
    release_local_checkpoint(nodes)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: tuple = (85, 100),
    total: int = 10**12,
    dedup_edges: bool = True,
    prepared: Optional[tuple] = None,
) -> DataFrame:
    """(node, r_pico BIGINT, rank DOUBLE) for every node in the edge
    graph after ``iters`` integer-exact PageRank iterations.

    ``rank = r_pico / total`` is one correctly-rounded IEEE division
    of exactly-representable operands (r_pico < 2^53 at the default
    total=1e12; a caller-raised total past 2^53 keeps r_pico exact
    but makes the double conversion round — the BIGINT column stays
    the source of truth), so it too is engine-identical. NULL
    endpoints are dropped; parallel edges collapse to one unless
    ``dedup_edges=False`` (then they weight the contribution, the
    multigraph convention)."""
    d_num, d_den = int(damping[0]), int(damping[1])
    if not (0 < d_num <= d_den):
        raise ValueError("damping must be a rational in (0, 1]")
    if d_num * int(total) >= 1 << 62:
        raise ValueError("d_num * total must stay below 2^62 for int64 headroom")
    if int(iters) < 0:
        raise ValueError("iters must be >= 0")

    if prepared is None:
        e, nodes, n = prepare_graph(edges, src, dst, dedup_edges)
        owns_graph = True
    else:
        # caller-shared graph (prepare_graph): the caller owns the
        # checkpoints and releases them via release_graph
        e, nodes, n = prepared
        owns_graph = False

    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("od")
    )
    if n == 0:
        return nodes.select(
            "node",
            F.lit(None).cast("bigint").alias("r_pico"),
            F.lit(None).cast("double").alias("rank"),
        )

    # edges with the SOURCE's out-degree, computed once and reused by
    # every iteration (deg is derived from e, so every src matches).
    # persist(), not localCheckpoint: both frames derive from the
    # already-checkpointed e with one cheap hop, so a lazy cache
    # materializes them inside iteration 1's job instead of costing
    # two extra eager passes up front (measured ~0.8 s of the gate
    # leg at sf0.1; at scale, two fewer full passes)
    from pyspark import StorageLevel

    ed = (
        e.join(deg, e["src"] == deg["node"])
        .select("src", "dst", "od")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    base = ((d_den - d_num) * int(total)) // (d_den * n)
    r0 = int(total) // n
    # the state carries a dangling flag (no out-edge) so the per-round
    # dangling-mass aggregate is a filter over the checkpoint instead
    # of a |dangling|-row join against a persisted anti-join frame
    ranks = (
        nodes.join(deg, "node", "left")
        .select(
            "node",
            F.col("od").isNull().alias("__dang"),
            F.lit(r0).cast("bigint").alias("r"),
        )
    )

    from pyspark.sql import Observation

    prev_ckpt = None
    dsum_val: Optional[int] = None
    for _ in range(int(iters)):
        # dangling mass as a DRIVER-SIDE bigint literal. Iteration 1
        # collects it with the same filter-sum the old broadcast
        # carried (the 1-row aggregate job that used to feed the
        # crossJoin); every later iteration reads it from the metric
        # OBSERVED on the previous round's checkpoint job — the
        # per-iteration |V|-row dangling-sum pass (and its broadcast
        # exchange) disappears at any scale. The literal feeds the
        # IDENTICAL Spark-side div arithmetic below, so r is
        # bit-identical to the broadcast-column form.
        if dsum_val is None:
            row = ranks.filter("__dang").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("__d")
            ).collect()[0]
            dsum_val = int(row["__d"])
        # presence fold (the connected-components trick): instead of a
        # nodes-vs-contrib left join per round, every node rides into
        # the contribution aggregation as one marker row (NULL __c, so
        # sums are unchanged; exactly one non-null __dang per group, so
        # max() recovers the flag). Groups == nodes exactly (every dst
        # is in nodes; every node has a marker), so the per-round
        # |V|-row join disappears and the groupBy is the only shuffle.
        contrib_rows = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select(
                F.col("dst").alias("node"),
                F.lit(None).cast("boolean").alias("__dang"),
                F.expr(
                    f"CAST({d_num} AS BIGINT) * r div "
                    f"(CAST({d_den} AS BIGINT) * od)"
                ).alias("__c"),
            )
        )
        marker_rows = ranks.select(
            "node", "__dang", F.lit(None).cast("bigint").alias("__c")
        )
        folded = (
            marker_rows.union(contrib_rows)
            .groupBy("node")
            .agg(
                F.max("__dang").alias("__dang"),
                F.sum("__c").cast("bigint").alias("__cs"),
            )
        )
        obs = Observation()
        ranks = (
            folded.select(
                "node",
                "__dang",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"CAST({d_num} AS BIGINT) * "
                        f"CAST({dsum_val} AS BIGINT) div "
                        f"(CAST({d_den} AS BIGINT) * {n})"
                    )
                    + F.coalesce(F.col("__cs"), F.lit(0).cast("bigint"))
                ).alias("r"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("__dang"), F.col("r"))), F.lit(0)
                ).cast("bigint").alias("__d"),
            )
            .localCheckpoint()
        )
        dsum_val = int(obs.get["__d"])
        # the new checkpoint is self-contained: release the previous
        # round's blocks (leaked checkpoints pressure the block
        # manager for the rest of the session — measured as drift on
        # UNRELATED queries in the shared bench session; plain
        # unpersist() does NOT free checkpoint blocks, see
        # plans/blocks.py)
        if prev_ckpt is not None:
            release_local_checkpoint(prev_ckpt)
        prev_ckpt = ranks

    # the returned frame depends only on the final checkpoint —
    # except at iters=0, where it still reads the nodes checkpoint
    ed.unpersist()
    if owns_graph:
        release_local_checkpoint(e)
        if int(iters) > 0:
            release_local_checkpoint(nodes)
    return ranks.select(
        "node",
        F.col("r").alias("r_pico"),
        (F.col("r").cast("double") / F.lit(float(total))).alias("rank"),
    )


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 10,
    damping: tuple = (85, 100),
    total: int = 10**12,
    dedup_edges: bool = True,
) -> str:
    """DuckDB twin of :func:`pagerank` — the iteration chain unrolled
    into one MATERIALIZED CTE per round (non-materialized CTEs are
    inlined per reference in DuckDB, which made a similar replay
    quadratic in the sf1 sweep — see the IVF-PQ fix). ``edges_sql``
    must yield (src, dst)."""
    d_num, d_den = int(damping[0]), int(damping[1])
    distinct = "DISTINCT " if dedup_edges else ""
    parts = [
        f"""e AS MATERIALIZED (
  SELECT {distinct}CAST(src AS VARCHAR) AS src, CAST(dst AS VARCHAR) AS dst
  FROM ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL
)""",
        """deg AS MATERIALIZED (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY src
)""",
        """nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
)""",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        f"""r0 AS MATERIALIZED (
  SELECT node, CAST({total} // nn.n AS BIGINT) AS r FROM nodes, nn
)""",
    ]
    for k in range(int(iters)):
        parts.append(
            f"""d{k} AS (
  SELECT CAST(coalesce(sum(r{k}.r), 0) AS BIGINT) AS d
  FROM r{k} LEFT JOIN deg ON deg.node = r{k}.node WHERE deg.od IS NULL
)"""
        )
        parts.append(
            f"""c{k} AS (
  SELECT e.dst AS node,
         CAST(sum(({d_num} * r{k}.r) // ({d_den} * deg.od)) AS BIGINT) AS cs
  FROM r{k} JOIN deg ON deg.node = r{k}.node JOIN e ON e.src = r{k}.node
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""r{k + 1} AS MATERIALIZED (
  SELECT nodes.node,
         CAST((({d_den} - {d_num}) * {total}) // ({d_den} * nn.n)
              + ({d_num} * d{k}.d) // ({d_den} * nn.n)
              + coalesce(c{k}.cs, 0) AS BIGINT) AS r
  FROM nodes CROSS JOIN nn CROSS JOIN d{k}
  LEFT JOIN c{k} ON c{k}.node = nodes.node
)"""
        )
    final = f"r{int(iters)}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, r AS r_pico, CAST(r AS DOUBLE) / {float(total)!r} AS rank
FROM {final}
"""
    )


def _host(c: Column) -> Column:
    """Normalized host: lowercase, bare domain from a URL or already-
    bare hostname (strips scheme/port/path when present)."""
    from quality_spark.llm.urls import DOMAIN_PATTERN

    raw = F.lower(F.trim(c))
    return F.when(
        raw.rlike("^https?://"), F.regexp_extract(raw, DOMAIN_PATTERN, 1)
    ).otherwise(F.regexp_extract(raw, r"^([a-z0-9.-]+)", 1))


def domain_link_edges(
    df: DataFrame,
    src_col: str,
    text_col: str = "text",
    drop_self: bool = True,
) -> DataFrame:
    """(src, dst) host edges from documents: the document's own host
    (``src_col`` — a URL or bare hostname column) links to every host
    whose URL appears in ``text_col``. Hosts lowercase-normalized;
    empty hosts dropped; self-links dropped by default (a page citing
    its own site says nothing about authority). One projection + one
    explode — no shuffle until the caller aggregates."""
    from quality_spark.llm.urls import _domains

    out = (
        df.select(
            _host(F.col(src_col)).alias("src"),
            F.explode(_domains(text_col)).alias("__d"),
        )
        .select("src", F.lower(F.col("__d")).alias("dst"))
        .filter((F.col("src") != "") & (F.col("dst") != ""))
    )
    if drop_self:
        out = out.filter(F.col("src") != F.col("dst"))
    return out


def domain_pagerank(
    df: DataFrame,
    src_col: str,
    text_col: str = "text",
    iters: int = 10,
    damping: tuple = (85, 100),
    total: int = 10**12,
) -> DataFrame:
    """One-call host authority ranking over a web corpus: extract the
    host link graph, rank it. Join the result back on
    ``host == node`` to filter/weight documents by source authority."""
    return pagerank(
        domain_link_edges(df, src_col, text_col),
        iters=iters,
        damping=damping,
        total=total,
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    total: int = 10**9,
    dedup_edges: bool = True,
    prepared: Optional[tuple] = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999), integer-exact:
    (node, authority_nano, hub_nano, authority, hub) after ``iters``
    mutual-reinforcement rounds.

    Integer spec: both score vectors live in nano units summing to
    ``total`` (≤ floor leak). One round is

        a_raw(v) = Σ_{u→v} h(u);  a(v) = (a_raw·total) DIV Σ a_raw
        h_raw(u) = Σ_{u→v} a(v);  h(u) = (h_raw·total) DIV Σ h_raw

    — L1 normalization instead of the textbook L2 (a square root is
    not exactly replayable; L1 preserves the ranking and the
    mutual-reinforcement fixpoint structure). Why ``total`` defaults
    to 1e9 and not PageRank's 1e12: the scaling multiply ``a_raw ·
    total`` must fit int64 under Spark's ``div`` (which silently
    routes DECIMAL through LONG), and a_raw ≤ total, so total² < 2^63
    is required — validated, like N ≤ total (an all-zero init can
    never recover).

    100 TB shape: two contribution shuffles per iteration (groupBy
    dst, then groupBy src) + two 1-row mass aggregates (broadcast
    crossJoin, the repo's 1-row pattern); the (node, a, h) state is
    checkpointed once per round."""
    if int(iters) < 0:
        raise ValueError("iters must be >= 0")
    if int(total) ** 2 >= 1 << 63:
        raise ValueError("total^2 must stay below 2^63 for int64 headroom")

    if prepared is None:
        e, nodes, n = prepare_graph(edges, src, dst, dedup_edges)
        owns_graph = True
    else:
        e, nodes, n = prepared
        owns_graph = False
    if n == 0:
        return nodes.select(
            "node",
            F.lit(None).cast("bigint").alias("authority_nano"),
            F.lit(None).cast("bigint").alias("hub_nano"),
            F.lit(None).cast("double").alias("authority"),
            F.lit(None).cast("double").alias("hub"),
        )
    if n > int(total):
        raise ValueError(
            f"{n} nodes > total={total}: the uniform init would be all "
            "zeros; raise total (keeping total^2 < 2^63)"
        )

    h0 = int(total) // n
    state = nodes.select(
        "node",
        F.lit(0).cast("bigint").alias("a"),
        F.lit(h0).cast("bigint").alias("h"),
    )
    prev_ckpt = None
    for _ in range(int(iters)):
        # presence fold (same trick as pagerank / connected_components):
        # every state row rides into the contribution aggregation as a
        # marker row (NULL contribution, so sums are unchanged), so
        # groups == nodes exactly and neither normalization needs a
        # nodes-vs-raw left join; the h-phase marker additionally
        # carries `a` (exactly one non-null per group → max() recovers
        # it), which removes the former a_new ⋈ h_new state join. Three
        # |V|-row joins per round gone; the two contribution groupBys
        # remain the only shuffles.
        a_pre = (
            state.select(
                "node", F.lit(None).cast("bigint").alias("__c")
            )
            .union(
                state.join(e, state["node"] == e["src"]).select(
                    F.col("dst").alias("node"), F.col("h").alias("__c")
                )
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("bigint").alias("__ar"))
        )
        sa = a_pre.agg(
            F.coalesce(F.sum("__ar"), F.lit(0)).cast("bigint").alias("__sa")
        )
        a_new = (
            a_pre.crossJoin(F.broadcast(sa))
            .select(
                "node",
                F.expr(
                    f"CASE WHEN __sa > 0 THEN "
                    f"coalesce(__ar, CAST(0 AS BIGINT)) * {int(total)} "
                    f"div __sa ELSE CAST(0 AS BIGINT) END"
                ).alias("a"),
            )
        )
        h_pre = (
            a_new.select(
                "node",
                F.col("a").alias("__a"),
                F.lit(None).cast("bigint").alias("__c"),
            )
            .union(
                a_new.join(e, a_new["node"] == e["dst"]).select(
                    F.col("src").alias("node"),
                    F.lit(None).cast("bigint").alias("__a"),
                    F.col("a").alias("__c"),
                )
            )
            .groupBy("node")
            .agg(
                F.max("__a").cast("bigint").alias("a"),
                F.sum("__c").cast("bigint").alias("__hr"),
            )
        )
        sh = h_pre.agg(
            F.coalesce(F.sum("__hr"), F.lit(0)).cast("bigint").alias("__sh")
        )
        state = (
            h_pre.crossJoin(F.broadcast(sh))
            .select(
                "node",
                "a",
                F.expr(
                    f"CASE WHEN __sh > 0 THEN "
                    f"coalesce(__hr, CAST(0 AS BIGINT)) * {int(total)} "
                    f"div __sh ELSE CAST(0 AS BIGINT) END"
                ).alias("h"),
            )
            .localCheckpoint()
        )
        # release the previous round's blocks (same hygiene as
        # pagerank — plans/blocks.py)
        if prev_ckpt is not None:
            release_local_checkpoint(prev_ckpt)
        prev_ckpt = state
    if owns_graph and int(iters) > 0:
        release_local_checkpoint(e)
        release_local_checkpoint(nodes)
    t = float(total)
    return state.select(
        "node",
        F.col("a").alias("authority_nano"),
        F.col("h").alias("hub_nano"),
        (F.col("a").cast("double") / F.lit(t)).alias("authority"),
        (F.col("h").cast("double") / F.lit(t)).alias("hub"),
    )


def hits_oracle_sql(
    edges_sql: str,
    iters: int = 8,
    total: int = 10**9,
    dedup_edges: bool = True,
) -> str:
    """DuckDB twin of :func:`hits` — unrolled MATERIALIZED CTE chain,
    HUGEINT arithmetic (exact; every value stays under 2^63 by the
    same bounds the Spark side validates)."""
    distinct = "DISTINCT " if dedup_edges else ""
    t = int(total)
    parts = [
        f"""e AS MATERIALIZED (
  SELECT {distinct}CAST(src AS VARCHAR) AS src, CAST(dst AS VARCHAR) AS dst
  FROM ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL
)""",
        """nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
)""",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        f"""s0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS a, CAST({t} // nn.n AS BIGINT) AS h
  FROM nodes, nn
)""",
    ]
    for k in range(int(iters)):
        parts.append(
            f"""ar{k} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(sum(s{k}.h) AS HUGEINT) AS ar
  FROM s{k} JOIN e ON e.src = s{k}.node GROUP BY e.dst
)"""
        )
        parts.append(
            f"sa{k} AS (SELECT CAST(coalesce(sum(ar), 0) AS HUGEINT) "
            f"AS sa FROM ar{k})"
        )
        parts.append(
            f"""an{k} AS MATERIALIZED (
  SELECT nodes.node,
         CAST(CASE WHEN sa{k}.sa > 0
              THEN (coalesce(ar{k}.ar, 0) * {t}) // sa{k}.sa
              ELSE 0 END AS BIGINT) AS a
  FROM nodes CROSS JOIN sa{k}
  LEFT JOIN ar{k} ON ar{k}.node = nodes.node
)"""
        )
        parts.append(
            f"""hr{k} AS MATERIALIZED (
  SELECT e.src AS node, CAST(sum(an{k}.a) AS HUGEINT) AS hr
  FROM an{k} JOIN e ON e.dst = an{k}.node GROUP BY e.src
)"""
        )
        parts.append(
            f"sh{k} AS (SELECT CAST(coalesce(sum(hr), 0) AS HUGEINT) "
            f"AS sh FROM hr{k})"
        )
        parts.append(
            f"""s{k + 1} AS MATERIALIZED (
  SELECT nodes.node, an{k}.a,
         CAST(CASE WHEN sh{k}.sh > 0
              THEN (coalesce(hr{k}.hr, 0) * {t}) // sh{k}.sh
              ELSE 0 END AS BIGINT) AS h
  FROM nodes CROSS JOIN sh{k}
  LEFT JOIN hr{k} ON hr{k}.node = nodes.node
  JOIN an{k} ON an{k}.node = nodes.node
)"""
        )
    final = f"s{int(iters)}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, a AS authority_nano, h AS hub_nano,
       CAST(a AS DOUBLE) / {float(t)!r} AS authority,
       CAST(h AS DOUBLE) / {float(t)!r} AS hub
FROM {final}
"""
    )
