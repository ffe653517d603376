"""Distributed (k,P)-anonymity END TO END — C3+C4+C5+F9 past the
tree-split phase (the round-3 verdict's #1 directive).

``grouping.kp_anonymize`` runs the whole reference pipeline
(reference ``k_P_anonymity.py:58-103``) inside one ``applyInPandas``
task per source — correct, parity-certified, but bounded by one Arrow
batch per source. ``tree_dist.create_tree_distributed`` removed that
bound for the SPLIT phase only; this module removes it for the rest:
recycle-bad-leaves (reference ``includes/node.py:224-397``, C4),
bottom-up k-group formation (reference ``includes/k_anonymity.py:34-167``,
C5) and l-diversity (reference ``includes/l_diversity.py:7-107``, F9)
now run with records distributed throughout.

How each phase distributes (the 10^12-sequence shapes):

- **C4 recycle** needs only leaf SUMMARIES: per leaf (level, pattern,
  count, min doc, that doc's per-level SAX patterns). One
  ``groupBy(leaf_id)`` aggregate — output is leaf-metadata-sized — and
  the decision core ``clustering.recycle_bad_leaves_meta`` (the SAME
  code the in-memory kernel runs) executes on the driver over those
  summaries. Records never move.
- **C5 merge** is exact on envelope summaries (VL is envelope-
  determined, SURVEY.md §2.9): one ``groupBy(p-subgroup)`` envelope
  aggregate, then ``clustering.kgroups_from_subgroups`` (again the
  shared decision core). Up to ``c5_exact_max`` subgroups the core
  runs on the driver over one row per subgroup — O(n_subgroups^2)
  time, O(n_subgroups * T) memory, i.e. RECORDS-scaled (≈ n/P
  subgroups for a giant source), fine to ~1e5 subgroups and a
  bottleneck beyond. Above the threshold the SHARDED variant engages:
  subgroup summaries stay in a DataFrame, are sharded into bounded
  contiguous ranges of the same DFS pgl order (tree locality as the
  envelope-locality proxy), and the SAME decision core runs per shard
  in ``applyInPandas``; driver state is then one row per P-GROUP
  (leaf-metadata-sized), never per subgroup. The sharded grouping is
  a deliberate approximation of the sequential global greedy (shards
  never merge across their boundary — reference semantics are
  inherently sequential here) that preserves every k/P/l invariant
  and is parity-equal to the exact core whenever one shard covers all
  subgroups (tests/test_anonymize_dist.py).
- **C5 preprocessing** (splitting P-groups >= 2P via C1+C2) is the one
  genuinely sequential-greedy part (reference ``includes/common.py``);
  it runs per-P-GROUP in ``applyInPandas`` — embarrassingly parallel
  across groups with per-group seeded RNG. The Arrow bound therefore
  drops from per-SOURCE to per-P-GROUP (P-groups are O(P)-sized except
  the pathological all-records-share-one-max-level-pattern source,
  which retains an in-memory bound for that group — documented
  residual).
- **F9 l-diversity** perturbs within a PS_R (same k-group, same SAX
  pattern) only, so it runs per-PS_R in ``applyInPandas`` with
  per-PS_R seeded RNG.

DETERMINISTIC ORDER CONTRACT (what makes the distributed run equal the
in-memory kernel record for record, independent of partition layout):

1. records within any scope order by ``doc_id`` (binary/ASCII
   comparison — Spark's string ordering must match Python's);
2. leaves order by the DFS ``order_key`` emitted by
   ``create_tree_distributed`` (proven equal to the recursive kernel's
   append order, tests/test_tree_dist.py);
3. a merged-TB / recycled leaf's "first record" is its min doc;
4. RNG scopes are content-addressed: the C5 split of a P-group seeds
   from (seed, source, group's min doc); a PS_R seeds from (seed,
   source, k-group index, pattern);
5. a record the C2 postprocess quirk duplicated across subgroups is
   l-diversity-processed in its FIRST k-group only and rendered in its
   LAST (the reference's renderer dedup rule,
   ``anonymized_dataset.py:22-50``).

``kp_anonymize_canonical`` is the in-memory twin: the same contract,
the same shared decision cores, executed in one pandas kernel per
source. ``tests/test_anonymize_dist.py`` pins the two paths to
row-for-row equality; the quirk-exact ``kp_anonymize`` remains the
reference-parity path (product golden) — canonical mode differs from
it only in the order-contract points above.

Driver-side state is node/leaf/P-group METADATA (one row per leaf /
P-group) plus — on the exact C5 path only — one row per SUBGROUP
(records-scaled for a giant source; the sharded path above
``c5_exact_max`` removes it). Every per-record operation is a
DataFrame op on both paths.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import clustering as C
from ..functions import sax as S
from ..functions.metrics import envelope
from .grouping import ANON_SCHEMA
from .tree_dist import create_tree_distributed, pattern_arrays

_SPLIT_SCHEMA = "doc_id string, pg int, sub int, pos int"
_ENV_SCHEMA = ("pg int, sub int, hi array<double>, lo array<double>, "
               "phi array<long>, plo array<long>, n long")
_LDIV_SCHEMA = "doc_id string, as_perturbed long"
_SUBMAP_SCHEMA = ("pg int, sub int, kg long, rank int, "
                  "glo array<long>, ghi array<long>")


# ---------------------------------------------------------------------------
# shared phase logic (pure, driver-side, metadata only)
# ---------------------------------------------------------------------------

def _recycle_phase(p: int, paa: int, good_leaves: list[tuple],
                   bad_metas: list[C.MetaLeaf], pattern_of_first):
    """C4 over summaries. ``good_leaves``: (pattern, handle) in DFS
    order; ``bad_metas``: DFS order. Returns (pgroups as (pattern,
    handle, count, first) in the reference's good-list order,
    suppressed handles)."""
    good_new, supp = C.recycle_bad_leaves_meta(
        p, paa, bad_metas, pattern_of_first, canonical=True)
    pgroups = ([(pat, handle, count, first)
                for (pat, handle, count, first) in good_leaves]
               + [(m.pattern, m.handle, m.count, m.first) for m in good_new])
    return pgroups, [m.handle for m in supp]


def _split_one_group(mat: np.ndarray, p: int, seed_val: int):
    """C1+C2 split of one oversized P-group (rows already doc-sorted;
    positions 0..n-1). Returns the post-processed subgroup list (each a
    list of row positions, reference order preserved — may duplicate a
    position across subgroups, the C2 quirk)."""
    rnd = C.NumpyRandomSource(seed_val)
    tmp: list[list[int]] = []
    lbl: list[str] = []
    C.top_down_greedy("kapra", list(range(len(mat))), p, mat, tmp, lbl, rnd)
    post: list[list[int]] = []
    C.postprocess_groups("kapra", p, tmp, lbl, post, mat)
    return post


def _ldiv_one_psr(ordered_sens: list[int], pattern: str, l_value: int,
                  seed_val: int) -> list[int]:
    """F9 for ONE PS_R: perturb the ordered sensitive values; returns
    the final values in the same order. Reuses the quirk-exact
    ``enforce_l_diversity`` restricted to a single group."""
    rnd = C.NumpyRandomSource(seed_val)
    keys = list(range(len(ordered_sens)))
    sens = {i: v for i, v in zip(keys, ordered_sens)}
    C.enforce_l_diversity({i: pattern for i in keys}, sens, [keys],
                          l_value, rnd)
    return [sens[i] for i in keys]


# ---------------------------------------------------------------------------
# in-memory canonical twin
# ---------------------------------------------------------------------------

def _anonymize_source_canonical(pdf: pd.DataFrame, k: int, p: int, paa: int,
                                l: int, seed: int,
                                max_level: int = S.MAX_LEVEL) -> pd.DataFrame:
    source = pdf["source"].iloc[0]
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    ids = pdf["doc_id"].tolist()
    mat = np.stack(pdf["tokens"].to_numpy()).astype(np.float64)
    values = mat[:, :-1]
    sensitive = {i: int(mat[i, -1]) for i in range(len(mat))}

    good: list[C.Leaf] = []
    bad: list[C.Leaf] = []
    C.split_node(values, list(range(len(values))), 1, "a" * paa, p, paa,
                 max_level, good, bad, canonical=True)

    bad_metas = [C.MetaLeaf(lf.level, lf.pattern, len(lf.rows),
                            min(lf.rows), sorted(lf.rows)) for lf in bad]

    def pat_first(first: int, level: int) -> str:
        return S.ts_to_string(S.paa(S.znorm(values[first]), paa),
                              S.cuts_for_asize(level))

    pgroups, supp_handles = _recycle_phase(
        p, paa,
        [(lf.pattern, sorted(lf.rows), len(lf.rows), min(lf.rows))
         for lf in good],
        bad_metas, pat_first)
    suppressed_rows = [list(h) for h in supp_handles]

    # C5 preprocessing (per-group seeded, like the distributed kernel)
    non_split: list[int] = []
    split_parts: list[tuple[int, list[list[int]]]] = []
    for gi, (_, rows_g, count, first) in enumerate(pgroups):
        if count >= 2 * p:
            rows_sorted = sorted(rows_g)
            sub = values[rows_sorted]
            post_local = _split_one_group(
                sub, p, C.stable_seed(seed, source, "c5split", ids[first]))
            split_parts.append(
                (gi, [[rows_sorted[i] for i in grp] for grp in post_local]))
        else:
            non_split.append(gi)

    ordered: list[tuple[int, int, list[int]]] = [
        (gi, 0, sorted(pgroups[gi][1])) for gi in non_split]
    for gi, post in split_parts:
        ordered.extend((gi, si, rows_s) for si, rows_s in enumerate(post))

    sub_rows: dict[tuple[int, int], list[int]] = {}
    pgl: list[C.SubgroupMeta] = []
    for gi, si, rows_s in ordered:
        hi, lo, n = envelope(values[rows_s])
        pgl.append(C.SubgroupMeta(
            handle=(gi, si), hi=hi, lo=lo, n=n,
            phi=values[rows_s].max(axis=0).astype(np.int64),
            plo=values[rows_s].min(axis=0).astype(np.int64)))
        sub_rows[(gi, si)] = rows_s

    t = values.shape[1]
    gl, unplaced = C.kgroups_from_subgroups(pgl, k, t)

    # F9 per PS_R (first k-group wins for processing)
    pattern_of_group = {gi: pat for gi, (pat, _, _, _) in enumerate(pgroups)}
    seen: set[int] = set()
    psr: dict[tuple[int, str], list[int]] = {}
    for kg_idx, members in enumerate(gl):
        for m in members:
            gi, _ = m.handle
            for r in sub_rows[m.handle]:
                if r in seen:
                    continue
                seen.add(r)
                psr.setdefault((kg_idx, pattern_of_group[gi]), []).append(r)
    for (kg_idx, pat), rows_p in psr.items():
        out_vals = _ldiv_one_psr([sensitive[r] for r in rows_p], pat, l,
                                 C.stable_seed(seed, source, "ldiv",
                                               kg_idx, pat))
        for r, v in zip(rows_p, out_vals):
            sensitive[r] = v

    # render: last k-group wins, suppressed overwrite last
    rowmap: dict[int, tuple] = {}
    for kg_idx, members in enumerate(gl):
        glo = np.minimum.reduce([m.plo for m in members])
        ghi = np.maximum.reduce([m.phi for m in members])
        for m in members:
            gi, _ = m.handle
            for r in sub_rows[m.handle]:
                rowmap[r] = (ids[r], source, f"{source}#{kg_idx}",
                             pattern_of_group[gi], sensitive[r],
                             glo, ghi, False)
    for handle in suppressed_rows + [sub_rows[m.handle] for m in unplaced]:
        for r in handle:
            rowmap[r] = (ids[r], source, None, None, None, None, None, True)

    cols = ["doc_id", "source", "group_id", "sax", "as_perturbed",
            "lo", "hi", "suppressed"]
    out: dict[str, list] = {c: [] for c in cols}
    for r in rowmap.values():
        for c, v in zip(cols, r):
            out[c].append(v)
    return pd.DataFrame(out)


def kp_anonymize_canonical(tokens_df: DataFrame, k: int, p: int, paa: int,
                           l: int = 1, seed: int = 42,
                           group_col: str = "source") -> DataFrame:
    """In-memory execution of the canonical order contract — the parity
    twin for :func:`kp_anonymize_distributed` (one Arrow batch per
    source, like ``kp_anonymize``, but with the distributed path's
    deterministic ordering and RNG scoping)."""
    if k < p:
        raise ValueError("k must be >= P (reference k_P_anonymity.py:40-44)")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _anonymize_source_canonical(pdf, k, p, paa, l, seed)

    return tokens_df.groupBy(group_col).applyInPandas(fn, ANON_SCHEMA)


# ---------------------------------------------------------------------------
# the distributed operator
# ---------------------------------------------------------------------------

def _one_source(tokens_src: DataFrame, source: str, k: int, p: int,
                paa: int, l: int, seed: int,
                max_level: int = S.MAX_LEVEL,
                c5_shard_size: int | None = None,
                c5_exact_max: int = 100_000) -> DataFrame:
    spark = tokens_src.sparkSession
    toks = tokens_src.select("doc_id", "tokens").cache()
    pats = pattern_arrays(toks, paa, max_level).cache()

    # ---- C3: global tree (records stay distributed) -------------------
    leaves = (create_tree_distributed(toks, p, paa, max_level, pats_df=pats)
              .localCheckpoint())

    # ---- leaf summaries (ONE leaf-metadata-sized collect) -------------
    summ = (leaves.join(pats, "doc_id")
            .groupBy("leaf_id")
            .agg(F.count("*").alias("cnt"),
                 F.min("doc_id").alias("first_doc"),
                 F.min_by("pats", "doc_id").alias("first_pats"),
                 F.first("level").alias("level"),
                 F.first("pattern").alias("pattern"),
                 F.first("label").alias("label"),
                 F.first("order_key").alias("okey"))
            .collect())
    pats.unpersist()
    good_summ = sorted((r for r in summ if r["label"] == "good-leaf"),
                       key=lambda r: r["okey"])
    bad_summ = sorted((r for r in summ if r["label"] == "bad-leaf"),
                      key=lambda r: r["okey"])

    # ---- C4: recycle on summaries (driver, shared decision core) ------
    first_pats = {r["first_doc"]: r["first_pats"] for r in bad_summ}

    def pat_first(first_doc: str, level: int) -> str:
        return first_pats[first_doc][level - 2]   # pats[0] is level 2

    bad_metas = [C.MetaLeaf(r["level"], r["pattern"], r["cnt"],
                            r["first_doc"], [r["leaf_id"]])
                 for r in bad_summ]
    pgroups, supp_handles = _recycle_phase(
        p, paa,
        [(r["pattern"], [r["leaf_id"]], r["cnt"], r["first_doc"])
         for r in good_summ],
        bad_metas, pat_first)
    supp_leaf_ids = [lid for h in supp_handles for lid in h]

    def suppressed_df(extra: DataFrame | None) -> DataFrame:
        sup = None
        if supp_leaf_ids:
            s_df = F.broadcast(spark.createDataFrame(
                [(lid,) for lid in supp_leaf_ids], "leaf_id string"))
            sup = (leaves.join(s_df, "leaf_id").select("doc_id"))
        if extra is not None:
            sup = extra if sup is None else sup.unionByName(extra)
        if sup is None:
            sup = spark.createDataFrame([], "doc_id string")
        return sup.distinct().select(
            "doc_id", F.lit(source).alias("source"),
            F.lit(None).cast("string").alias("group_id"),
            F.lit(None).cast("string").alias("sax"),
            F.lit(None).cast("long").alias("as_perturbed"),
            F.lit(None).cast("array<long>").alias("lo"),
            F.lit(None).cast("array<long>").alias("hi"),
            F.lit(True).alias("suppressed"))

    if not pgroups:   # everything suppressed (source smaller than P)
        out = suppressed_df(None)
        toks.unpersist()
        return out

    # ---- leaf -> P-group assignment (broadcast map join) --------------
    lp_df = F.broadcast(spark.createDataFrame(
        [(lid, gi) for gi, (_, lids, _, _) in enumerate(pgroups)
         for lid in lids],
        "leaf_id string, pg int"))
    assigned = (leaves.select("doc_id", "leaf_id").join(lp_df, "leaf_id")
                .select("doc_id", "pg"))

    # ---- C5 preprocessing: per-P-GROUP split (Arrow bound = P-group) --
    oversized = sorted(gi for gi, (_, _, cnt, _) in enumerate(pgroups)
                       if cnt >= 2 * p)
    first_by_pg = {gi: fd for gi, (_, _, _, fd) in enumerate(pgroups)}

    base_assign = assigned.select(
        "doc_id", "pg", F.lit(0).alias("sub"), F.lit(0).alias("pos"))
    if oversized:
        seed_by_pg = {gi: C.stable_seed(seed, source, "c5split",
                                        first_by_pg[gi])
                      for gi in oversized}

        def split_kernel(key, pdf):
            gi = int(key[0])
            pdf = pdf.sort_values("doc_id").reset_index(drop=True)
            mat = np.stack(pdf["tokens"].to_numpy()).astype(np.float64)[:, :-1]
            post = _split_one_group(mat, p, seed_by_pg[gi])
            docs, subs, poss = [], [], []
            for si, rows_s in enumerate(post):
                for pos, r in enumerate(rows_s):
                    docs.append(pdf["doc_id"].iloc[r])
                    subs.append(si)
                    poss.append(pos)
            return pd.DataFrame({"doc_id": docs,
                                 "pg": np.full(len(docs), gi, np.int32),
                                 "sub": np.array(subs, np.int32),
                                 "pos": np.array(poss, np.int32)})

        ov_df = F.broadcast(spark.createDataFrame(
            [(gi,) for gi in oversized], "pg int"))
        split_assign = (assigned.join(ov_df, "pg").join(toks, "doc_id")
                        .groupBy("pg")
                        .applyInPandas(split_kernel, _SPLIT_SCHEMA))
        assignment = (base_assign.join(ov_df, "pg", "left_anti")
                      .unionByName(split_assign))
    else:
        assignment = base_assign
    assignment = assignment.localCheckpoint()

    # ---- subgroup envelopes ------------------------------------------
    def env_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["tokens"].to_numpy()).astype(np.float64)[:, :-1]
        hi, lo, n = envelope(m)
        return pd.DataFrame({
            "pg": [int(pdf["pg"].iloc[0])], "sub": [int(pdf["sub"].iloc[0])],
            "hi": [hi.tolist()], "lo": [lo.tolist()],
            "phi": [m.max(axis=0).astype(np.int64).tolist()],
            "plo": [m.min(axis=0).astype(np.int64).tolist()],
            "n": [int(n)]})

    env_df = (assignment.join(toks, "doc_id")
              .groupBy("pg", "sub")
              .applyInPandas(env_kernel, _ENV_SCHEMA))

    # subgroup counts per P-group (one row per P-GROUP — leaf-metadata-
    # sized) decide exact vs sharded BEFORE any per-subgroup collect
    unsplit_gis = [gi for gi in range(len(pgroups))
                   if gi not in set(oversized)]
    ns_by_pg = {gi: 1 for gi in unsplit_gis}
    if oversized:
        for r in (assignment.join(F.broadcast(spark.createDataFrame(
                [(gi,) for gi in oversized], "pg int")), "pg")
                .groupBy("pg").agg((F.max("sub") + 1).alias("ns"))
                .collect()):
            ns_by_pg[r["pg"]] = int(r["ns"])
    n_subgroups = sum(ns_by_pg.values())
    pattern_of_group = {gi: pat for gi, (pat, _, _, _) in enumerate(pgroups)}

    # ---- C5 merge: exact (driver greedy over ALL subgroup summaries,
    # O(n_subgroups^2) time — fine to ~1e5) or sharded (the SAME greedy
    # per bounded shard of DFS-adjacent subgroups, inside applyInPandas
    # — driver state stays P-group-metadata-sized) ----------------------
    use_sharded = n_subgroups > max(c5_exact_max, 0)
    if not use_sharded:
        env_rows = env_df.collect()
        env_map = {(r["pg"], r["sub"]): r for r in env_rows}

        # pgl order contract: unsplit groups by index, then split
        # products by (group index, sub index) — the reference's list
        # construction
        ordered_keys = [(gi, 0) for gi in unsplit_gis]
        for gi in oversized:
            subs = sorted(s for (g, s) in env_map if g == gi)
            ordered_keys.extend((gi, s) for s in subs)
        ordered_keys = [key for key in ordered_keys if key in env_map]

        t = len(env_map[ordered_keys[0]]["hi"]) if ordered_keys else 1
        pgl = [C.SubgroupMeta(
            handle=key,
            hi=np.asarray(env_map[key]["hi"], np.float64),
            lo=np.asarray(env_map[key]["lo"], np.float64),
            n=int(env_map[key]["n"]),
            phi=np.asarray(env_map[key]["phi"], np.int64),
            plo=np.asarray(env_map[key]["plo"], np.int64))
            for key in ordered_keys]
        gl, unplaced = C.kgroups_from_subgroups(pgl, k, t)

        sub_map_rows = []
        for kg_idx, members in enumerate(gl):
            glo = np.minimum.reduce([m.plo for m in members]).tolist()
            ghi = np.maximum.reduce([m.phi for m in members]).tolist()
            for rank, m in enumerate(members):
                gi, si = m.handle
                sub_map_rows.append((gi, si, kg_idx, rank, glo, ghi))
        for m in unplaced:
            gi, si = m.handle
            sub_map_rows.append((gi, si, -1, 0, None, None))
        sub_map_df = F.broadcast(spark.createDataFrame(
            sub_map_rows, _SUBMAP_SCHEMA))
    else:
        # shard = a contiguous range of the SAME pgl order (DFS-adjacent
        # subgroups share tree locality, the cheap envelope-locality
        # proxy); each shard runs the exact decision core unchanged.
        # This is the explicitly-flagged scale variant: k-groups never
        # merge across shards, so the grouping differs from the exact
        # global greedy (every k/P/l invariant still holds — each shard
        # has >= shard_size >= k records, so kgroups_from_subgroups
        # always forms k-groups and attaches leftovers in-shard).
        shard_size = int(c5_shard_size or max(4096, 4 * k))
        shard_size = max(shard_size, k, 2)
        off_rows, acc = [], 0
        for gi in unsplit_gis:
            off_rows.append((gi, acc))
            acc += 1
        for gi in oversized:
            off_rows.append((gi, acc))
            acc += ns_by_pg[gi]
        off_df = F.broadcast(spark.createDataFrame(
            off_rows, "pg int, off long"))
        n_shards = max(1, n_subgroups // shard_size)
        kg_stride = 2 * shard_size   # last shard <= 2*shard_size - 1 subgroups
        env_idx = (env_df.join(off_df, "pg")
                   .withColumn("idx", F.col("off") + F.col("sub"))
                   .withColumn("shard", F.least(
                       F.floor(F.col("idx") / shard_size),
                       F.lit(n_shards - 1)).cast("int")))

        def shard_kernel(key, pdf):
            shard = int(key[0])
            pdf = pdf.sort_values("idx").reset_index(drop=True)
            t_loc = len(pdf["hi"].iloc[0])
            pgl_loc = [C.SubgroupMeta(
                handle=(int(pdf["pg"].iloc[i]), int(pdf["sub"].iloc[i])),
                hi=np.asarray(pdf["hi"].iloc[i], np.float64),
                lo=np.asarray(pdf["lo"].iloc[i], np.float64),
                n=int(pdf["n"].iloc[i]),
                phi=np.asarray(pdf["phi"].iloc[i], np.int64),
                plo=np.asarray(pdf["plo"].iloc[i], np.int64))
                for i in range(len(pdf))]
            gl_loc, unplaced_loc = C.kgroups_from_subgroups(pgl_loc, k, t_loc)
            rows = []
            for local, members in enumerate(gl_loc):
                glo = np.minimum.reduce([m.plo for m in members]).tolist()
                ghi = np.maximum.reduce([m.phi for m in members]).tolist()
                kg = shard * kg_stride + local
                for rank, m in enumerate(members):
                    gi, si = m.handle
                    rows.append((gi, si, kg, rank, glo, ghi))
            for m in unplaced_loc:   # only when a shard's card < k
                gi, si = m.handle
                rows.append((gi, si, -1, 0, None, None))
            return pd.DataFrame(
                rows, columns=["pg", "sub", "kg", "rank", "glo", "ghi"])

        sub_map_df = (env_idx.groupBy("shard")
                      .applyInPandas(shard_kernel, _SUBMAP_SCHEMA))

    # ---- common downstream: F9 + render off the subgroup map ----------
    pat_df = F.broadcast(spark.createDataFrame(
        list(pattern_of_group.items()), "pg int, pattern string"))
    a2all = assignment.join(sub_map_df, ["pg", "sub"]).join(pat_df, "pg")
    a2 = a2all.filter(F.col("kg") >= 0)
    unplaced_docs = a2all.filter(F.col("kg") < 0).select("doc_id")

    # ---- F9: l-diversity per PS_R (seed derived IN the kernel — no
    # driver-side per-k-group state) ------------------------------------
    sens = toks.select("doc_id",
                       F.element_at("tokens", -1).cast("long").alias("_sv"))
    w_first = Window.partitionBy("doc_id").orderBy("kg", "rank", "pos")

    def ldiv_kernel(key, pdf):
        kg, pat = int(key[0]), str(key[1])
        pdf = pdf.sort_values(["rank", "pos", "doc_id"]).reset_index(drop=True)
        vals = _ldiv_one_psr([int(v) for v in pdf["_sv"]], pat, l,
                             C.stable_seed(seed, source, "ldiv", kg, pat))
        return pd.DataFrame({"doc_id": pdf["doc_id"],
                             "as_perturbed": np.array(vals, np.int64)})

    ldiv_out = (a2.withColumn("_rn", F.row_number().over(w_first))
                .filter(F.col("_rn") == 1).drop("_rn")
                .join(sens, "doc_id")
                .groupBy("kg", "pattern")
                .applyInPandas(ldiv_kernel, _LDIV_SCHEMA))

    # ---- render: last k-group wins; the k-group envelope (glo/ghi,
    # plain-bound union over members — exact, min/max ignore duplicates)
    # rides on every subgroup-map row -----------------------------------
    w_last = Window.partitionBy("doc_id").orderBy(
        F.desc("kg"), F.desc("rank"), F.desc("pos"))
    rendered = (a2.withColumn("_rn", F.row_number().over(w_last))
                .filter(F.col("_rn") == 1).drop("_rn")
                .join(ldiv_out, "doc_id")
                .select("doc_id", F.lit(source).alias("source"),
                        F.concat(F.lit(f"{source}#"), F.col("kg"))
                        .alias("group_id"),
                        F.col("pattern").alias("sax"),
                        "as_perturbed",
                        F.col("glo").alias("lo"), F.col("ghi").alias("hi"),
                        F.lit(False).alias("suppressed"))
                # suppression wins for a quirk-duplicated record that
                # landed in both a k-group and an unplaced subgroup
                # (the canonical twin's rowmap overwrite order)
                .join(unplaced_docs, "doc_id", "left_anti"))

    out = rendered.unionByName(suppressed_df(unplaced_docs))
    toks.unpersist()
    return out


def kp_anonymize_distributed(tokens_df: DataFrame, k: int, p: int, paa: int,
                             l: int = 1, seed: int = 42,
                             group_col: str = "source",
                             max_level: int = S.MAX_LEVEL,
                             max_sources: int = 100,
                             c5_shard_size: int | None = None,
                             c5_exact_max: int = 100_000) -> DataFrame:
    """(k,P)-anonymity with l-diversity, records distributed through
    EVERY phase — the scale path for sources too large for one Arrow
    batch (``kp_anonymize``'s bound), replacing the semantics-changing
    ``max_rows_per_split`` pre-split: groups here may span any subset
    of a source, exactly like the reference's in-memory run.

    Output schema and semantics match ``kp_anonymize`` under the
    canonical order contract (see module docstring);
    ``kp_anonymize_canonical`` is the in-memory twin it is
    parity-tested against.

    Sources are processed as independent trees in a driver loop (the
    intended workload is few giant sources; for many small sources use
    ``kp_anonymize``, whose per-source kernel is one task each).
    ``max_sources`` guards against that misuse: above it the union plan
    would have one branch per source and the driver loop one tree per
    source, so the call fails fast with a pointer at ``kp_anonymize``
    instead of building a pathological plan.

    C5 scale knobs (see :func:`_one_source`): when a source produces
    more than ``c5_exact_max`` P-subgroups the bottom-up merge switches
    from the exact driver greedy — O(n_subgroups^2) driver time,
    O(n_subgroups * T) driver memory — to the SHARDED greedy: the same
    decision core run per bounded shard of DFS-adjacent subgroups
    inside ``applyInPandas``, with only per-P-group counts on the
    driver. ``c5_shard_size`` (default ``max(4096, 4k)``) bounds each
    shard; set ``c5_exact_max=0`` to force the sharded path, or a huge
    value to force the exact path."""
    if k < p:
        raise ValueError("k must be >= P (reference k_P_anonymity.py:40-44)")
    sources = sorted(r[0] for r in
                     tokens_df.select(group_col).distinct().collect())
    if len(sources) > max_sources:
        raise ValueError(
            f"kp_anonymize_distributed saw {len(sources)} distinct "
            f"{group_col!r} values (max_sources={max_sources}). This "
            f"operator builds one distributed tree per source and is "
            f"meant for FEW GIANT sources; for many smaller sources "
            f"use kp_anonymize (one applyInPandas task per source), "
            f"or raise max_sources explicitly if you really want a "
            f"{len(sources)}-branch union plan.")
    outs = [_one_source(
        tokens_df.filter(F.col(group_col) == s).select("doc_id", "tokens"),
        s, k, p, paa, l, seed, max_level,
        c5_shard_size=c5_shard_size, c5_exact_max=c5_exact_max)
        for s in sources]
    if not outs:
        return tokens_df.sparkSession.createDataFrame([], ANON_SCHEMA)
    return reduce(lambda a, b: a.unionByName(b), outs)
