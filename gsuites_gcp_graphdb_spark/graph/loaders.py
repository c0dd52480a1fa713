"""ETL loader pipelines (SURVEY.md §2B) — the reference's crawlers
re-expressed as declarative DataFrame transforms feeding the upsert
kernel. Where the reference walks APIs page-by-page emitting guarded
Gremlin per row (getUsers main.go:189-219, getGroups 221-276,
getGroupMembers 278-356, getProjectServiceAccounts 358-382,
getIamPolicy 526-618, getIAM 620-713, getGCS 384-524), each loader
here is: source DataFrame -> project/explode/parse -> merge (set
semantics).

Consequences of set semantics (SURVEY.md §2.3):
- no two-pass sequencing (the reference's getGroups writes vertices in
  pass 1, edges in pass 2 purely to order the output file);
- no strict file concat order (README.md:286-289);
- loaders are idempotent and commute — any subset, any order, any
  number of repeats yields the same graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .build import bucket_edges, bucket_vertices, empty_edges, empty_vertices
from .schema import PSEUDO_GROUPS, vertex_id
from .traversal import Graph
from .upsert import upsert_edges, upsert_vertices


def _vertices(df: DataFrame, label: str, key_col, kind: str) -> DataFrame:
    key = key_col.cast("string")
    cols = {
        "email": F.lit(None).cast("string"),
        "name": F.lit(None).cast("string"),
        "projectid": F.lit(None).cast("string"),
    }
    cols[kind] = key
    return df.select(
        vertex_id(label, key).alias("id"),
        F.lit(label).alias("label"),
        cols["email"].alias("email"),
        cols["name"].alias("name"),
        cols["projectid"].alias("projectid"),
        (F.lit(False) if kind == "email" else F.lit(None).cast("boolean")).alias(
            "is_external"
        ),
    )


def _edges(pairs: DataFrame, src_label, dst_label: str) -> DataFrame:
    """pairs(src_key, dst_key[, src_label]) -> edge rows. src_label may
    be a literal string or the name of a column holding the label."""
    src_lbl = (
        F.col(src_label) if src_label in pairs.columns else F.lit(src_label)
    )
    return pairs.select(
        vertex_id(src_lbl, F.col("src_key")).alias("src"),
        vertex_id(dst_label, F.col("dst_key")).alias("dst"),
        F.lit("in").alias("label"),
        F.lit(1).cast("int").alias("weight"),
    )


def parse_member_bindings(members: DataFrame) -> DataFrame:
    """Total parser for IAM member strings (getIamPolicy's
    'type:email' dispatch, main.go:563-618 — which crashes on
    memberless tokens like 'allUsers'; the GCS path special-cases them
    at main.go:463-483, the IAM path doesn't).

    Input: (member string, dst_key). Output: (src_label, src_key,
    dst_key) with pseudo-principals mapped to group vertices, matching
    the reference's allUsers-as-group model.
    """
    parts = F.split(F.col("member"), ":")
    typed = members.select(
        F.when(
            F.col("member").isin(*PSEUDO_GROUPS), F.lit("group")
        )
        .when(F.element_at(parts, 1) == "user", F.lit("user"))
        .when(F.element_at(parts, 1) == "serviceAccount", F.lit("serviceAccount"))
        .when(F.element_at(parts, 1) == "group", F.lit("group"))
        .otherwise(F.lit("user"))
        .alias("src_label"),
        F.when(F.size(parts) >= 2, F.element_at(parts, 2))
        .otherwise(F.col("member"))
        .alias("src_key"),
        F.col("dst_key"),
    )
    return typed


def load_users(g: Graph, customer: DataFrame) -> Graph:
    """B2 getUsers: user-vertex upserts."""
    v = _vertices(customer.select("c_name"), "user", F.col("c_name"), "email")
    return Graph(upsert_vertices(g.vertices, v), g.edges)


def load_groups(
    g: Graph, nation: DataFrame, region: DataFrame, customer: DataFrame,
    supplier: DataFrame,
) -> Graph:
    """B3+B4 getGroups/getGroupMembers: group vertices, membership
    edges (user->group, serviceAccount->group), nested groups
    (group->group). One pass — set semantics make the reference's
    two-pass ordering (main.go:225-267) unnecessary."""
    v = (
        _vertices(nation.select("n_name"), "group", F.col("n_name"), "email")
        .unionByName(
            _vertices(region.select("r_name"), "group", F.col("r_name"), "email")
        )
    )
    ug = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).select(F.col("c_name").alias("src_key"), F.col("n_name").alias("dst_key"))
    sg = supplier.join(
        nation, supplier.s_nationkey == nation.n_nationkey
    ).select(F.col("s_name").alias("src_key"), F.col("n_name").alias("dst_key"))
    gg = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_name").alias("src_key"), F.col("r_name").alias("dst_key"))
    e = (
        _edges(ug, "user", "group")
        .unionByName(_edges(sg, "serviceAccount", "group"))
        .unionByName(_edges(gg, "group", "group"))
    )
    return Graph(
        upsert_vertices(g.vertices, v), upsert_edges(g.edges, e)
    )


def load_service_accounts(g: Graph, supplier: DataFrame) -> Graph:
    """B5 getProjectServiceAccounts — keyed on email, fixing the
    reference's never-matching existence check (main.go:587-588)."""
    v = _vertices(
        supplier.select("s_name"), "serviceAccount", F.col("s_name"), "email"
    )
    return Graph(upsert_vertices(g.vertices, v), g.edges)


def load_iam(
    g: Graph,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    include_permissions: bool = True,
) -> Graph:
    """B6+B7 getIamPolicy/getIAM: role + project vertices, user->role
    bindings, role->project bindings; permission vertices +
    permission->role edges behind the --includePermissions flag
    (main.go:56, 657-688)."""
    v = _vertices(
        part.select("p_brand"), "role", F.col("p_brand"), "name"
    ).unionByName(
        _vertices(part.select("p_name"), "project", F.col("p_name"), "projectid")
    )
    order_part = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_partkey")
        .dropDuplicates()
    )
    ur = (
        order_part.join(customer, order_part.o_custkey == customer.c_custkey)
        .join(part, order_part.l_partkey == part.p_partkey)
        .select(F.col("c_name").alias("src_key"), F.col("p_brand").alias("dst_key"))
    )
    rp = part.select(
        F.col("p_brand").alias("src_key"), F.col("p_name").alias("dst_key")
    )
    e = _edges(ur, "user", "role").unionByName(_edges(rp, "role", "project"))
    if include_permissions:
        v = v.unionByName(
            _vertices(part.select("p_type"), "permission", F.col("p_type"), "name")
        )
        pr = part.select(
            F.col("p_type").alias("src_key"), F.col("p_brand").alias("dst_key")
        )
        e = e.unionByName(_edges(pr, "permission", "role"))
    return Graph(upsert_vertices(g.vertices, v), upsert_edges(g.edges, e))


def load_gcs(g: Graph, part: DataFrame) -> Graph:
    """B10 getGCS (main.go:384-524): bucket vertices (composite
    (name, projectid) key, main.go:414-430), bucket -in-> project
    containment (main.go:440-458), and role -in-> bucket IAM bindings
    (main.go:491-514). Role vertices are upserted too — getGCS creates
    the role if the bucket policy names one the IAM crawl never saw."""
    v = bucket_vertices(part).unionByName(
        _vertices(part.select("p_brand"), "role", F.col("p_brand"), "name")
    )
    return Graph(
        upsert_vertices(g.vertices, v),
        upsert_edges(g.edges, bucket_edges(part)),
    )


def load_all(
    spark: SparkSession, sf_dir: str, include_permissions: bool = True
) -> Graph:
    """Component dispatch (B14, main.go:780-835): run every loader.
    Order is irrelevant (set semantics) — reversing this sequence
    yields the identical graph (tested)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    g = Graph(empty_vertices(spark), empty_edges(spark))
    g = load_users(g, customer)
    g = load_groups(g, nation, region, customer, supplier)
    g = load_service_accounts(g, supplier)
    g = load_iam(g, customer, orders, lineitem, part, include_permissions)
    g = load_gcs(g, part)
    return g
