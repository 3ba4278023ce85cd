"""Co-located bucketed joins must plan without a shuffle (no Exchange)."""

from pyspark.sql import functions as F

from jsonschema_infer_spark.sources.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "t_orders_b", ["custkey"]
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "custkey"), "t_cust_b", ["custkey"]
    )
    try:
        # disable broadcast so the join strategy would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "t_orders_b", "t_cust_b", ["custkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the join is still correct
        n = j.count()
        plain = orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
        assert n == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
