"""UDF surface: pandas_udf kernels agree with the JVM-side built-in route,
and registration exposes them to SQL."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.functions.udfs import make_udfs, register_udfs
from matrix_multiplication_bigdata_ind_assignments_spark.functions.vector import as_double, l2_norm
from matrix_multiplication_bigdata_ind_assignments_spark.sources import load


def test_pandas_udf_matches_builtin_route(spark, sf_dir):
    vec_l2_norm = make_udfs()["mmbd_l2_norm"]
    e = load(spark, sf_dir, "embeddings").limit(50)
    both = e.select(
        F.round(vec_l2_norm("embedding"), 6).alias("py"),
        F.round(l2_norm(as_double("embedding")), 6).alias("jvm"),
    )
    assert all(r["py"] == r["jvm"] for r in both.collect())


def test_sql_registration(spark, sf_dir):
    register_udfs(spark)
    load(spark, sf_dir, "documents").createOrReplaceTempView("udf_docs")
    rows = spark.sql(
        "SELECT doc_id, mmbd_token_count(text) AS n FROM udf_docs ORDER BY doc_id LIMIT 5"
    ).collect()
    expected = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    # whitespace-split semantics match python str.split for single-space text
    assert [(r["doc_id"], r["n"]) for r in rows] == [(r["doc_id"], r["n"]) for r in expected]
