"""Graph projections over the driver's TPC-H-ish parquet tables.

These are "cypher projection" analogues (GraphCreateProc.java:122-151 — arbitrary
query rows → graph): each builder is a Ray Data pipeline (pruned parquet reads +
the necessary shuffles) producing a canonical Graph whose vid arithmetic is simple
enough to replicate exactly in the DuckDB oracle SQL (see __ray_entry__).

vid layout of the hierarchy graph (regions smallest so WCC's min-vid component ids
equal the region keys):

    region   vid = r_regionkey                 (0..4)
    nation   vid = 5 + n_nationkey             (5..29)
    supplier vid = 30 + s_suppkey              (keys are 0-based)
    customer vid = 31 + max(s_suppkey) + c_custkey

edges: nation→region, supplier→nation, customer→nation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.graph import Graph
from .triangles import _wedges_from_segment

NATION_OFF = 5
SUPP_OFF = 30


def _read(sf_dir: str, table: str, columns):
    from ..sources.io import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _to_table(ds) -> pa.Table:
    import ray
    tabs = [t for t in (ray.get(r) for r in ds.materialize().to_arrow_refs())
            if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


def hierarchy_graph(sf_dir: str):
    """customer/supplier → nation → region forest; returns (Graph, cust_off)."""
    nation = _to_table(_read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]))
    supplier = _to_table(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    customer = _to_table(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]))
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False)
    nr = nation.column("n_regionkey").to_numpy(zero_copy_only=False)
    sk = supplier.column("s_suppkey").to_numpy(zero_copy_only=False)
    sn = supplier.column("s_nationkey").to_numpy(zero_copy_only=False)
    ck = customer.column("c_custkey").to_numpy(zero_copy_only=False)
    cn = customer.column("c_nationkey").to_numpy(zero_copy_only=False)
    cust_off = SUPP_OFF + int(sk.max()) + 1
    src = np.concatenate([NATION_OFF + nk, SUPP_OFF + sk, cust_off + ck])
    dst = np.concatenate([nr, NATION_OFF + sn, NATION_OFF + cn])
    n = int(cust_off + ck.max() + 1)
    return Graph.from_edges(src, dst, n=n, name="tpch_hierarchy"), cust_off


def hierarchy_vids(sf_dir: str):
    """All vids that correspond to actual rows (the graph's id space has gaps)."""
    g, cust_off = hierarchy_graph(sf_dir)
    present = np.unique(np.concatenate([g.src, g.dst]))
    return g, cust_off, present


def _distinct_part_supp(sf_dir: str):
    """Distinct (l_partkey, l_suppkey) pairs: per-batch Arrow dedup (drops the
    bulk) + one vectorized final unique — Ray's two-key sort groupby costs
    ~30s at sf0.1 for the same answer."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    deduped = ds.map_batches(
        lambda t: t.group_by(["l_partkey", "l_suppkey"]).aggregate([]),
        batch_format="pyarrow")
    t = _to_table(deduped)
    part = t.column("l_partkey").to_numpy(zero_copy_only=False)
    supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
    key = part.astype(np.int64) * (int(supp.max()) + 1) + supp
    uq = np.unique(key)
    return uq // (int(supp.max()) + 1), uq % (int(supp.max()) + 1)


def cosupply_graph(sf_dir: str) -> Graph:
    """Suppliers connected iff they supply the same part (distinct pairs from
    lineitem).  The distinct (part, supplier) reduction is the wide step; pair
    expansion reuses the vectorized segment-pair kernel."""
    part, supp = _distinct_part_supp(sf_dir)
    order = np.lexsort((supp, part))
    part, supp = part[order], supp[order]
    seg_starts = np.nonzero(np.concatenate(([True], part[1:] != part[:-1])))[0]
    seg_lens = np.diff(np.append(seg_starts, part.shape[0]))
    _, a, b = _wedges_from_segment(supp, seg_starts, seg_lens, part[seg_starts])
    n = int(supp.max()) + 1
    return Graph.from_edges(a, b, n=n, orientation="undirected",
                            aggregation="single", name="cosupply")


def supplier_part_graph(sf_dir: str) -> Graph:
    """Bipartite supplier→part graph from distinct lineitem pairs: supplier
    vid = l_suppkey, part vid = max_suppkey + 1 + l_partkey."""
    part, supp = _distinct_part_supp(sf_dir)
    off = int(supp.max()) + 1
    n = off + int(part.max()) + 1
    return Graph.from_edges(supp, off + part, n=n, aggregation="single",
                            name="supplier_part")


def chain_graph(sf_dir: str):
    """Chain customers with consecutive custkeys within each nation — long paths
    exercising multi-round WCC convergence.  Returns (Graph, custkeys)."""
    customer = _to_table(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]))
    ck = customer.column("c_custkey").to_numpy(zero_copy_only=False)
    cn = customer.column("c_nationkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, cn))
    ck_s, cn_s = ck[order], cn[order]
    same = cn_s[1:] == cn_s[:-1]
    src = ck_s[:-1][same]
    dst = ck_s[1:][same]
    n = int(ck.max()) + 1
    return Graph.from_edges(src, dst, n=n, name="cust_chain"), np.sort(ck)
