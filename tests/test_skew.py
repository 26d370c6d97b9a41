"""salted_join must be row-for-row identical to the plain join, with the
salt machinery visible in the physical plan (build-side replication, salted
join keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_spark.operators.skew import salted_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain_join(spark):
    stream = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ("hot", "hot", "cold")],
        ["k", "payload"],
    )
    build = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], ["k", "attr"]
    )
    got = salted_join(stream, build, on=["k"], n_salts=4)
    want = stream.join(build, ["k"])
    assert _rows(got) == _rows(want)


def test_salted_left_join_keeps_unmatched_once(spark):
    stream = spark.createDataFrame([("a", 1), ("x", 2)], ["k", "payload"])
    build = spark.createDataFrame([("a", 10)], ["k", "attr"])
    got = salted_join(stream, build, on=["k"], n_salts=8, how="left")
    want = stream.join(build, ["k"], "left")
    assert _rows(got) == _rows(want)


def test_salted_join_plan_replicates_build_side(spark):
    from data_warehouse_spark.plans.explain import plan_report

    stream = spark.createDataFrame([("a", 1)], ["k", "payload"])
    build = spark.createDataFrame([("a", 10)], ["k", "attr"])
    rep = plan_report(salted_join(stream, build, on=["k"], n_salts=4))
    # build replication = explode of the salt array → a Generate node, and
    # the join condition carries the salt column alongside the key
    assert "Generate" in rep.text, rep.text
    assert "__salt" in rep.text, rep.text


def test_salt_column_collision_rejected(spark):
    df = spark.createDataFrame([(1,)], ["__salt"])
    try:
        salted_join(df, df, on=["__salt"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_salted_join_rejects_build_sided_how(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    for how in ("right", "full", "right_outer", "full_outer"):
        try:
            salted_join(df, df, on=["k"], how=how)
            raise AssertionError(f"{how} must be rejected")
        except ValueError:
            pass
