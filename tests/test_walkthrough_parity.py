"""Replay of the reference's own walkthrough scenario end-to-end.

DMSCDC_SampleDB_Initial.sql creates store / product (with decimal
price) / orders; DMSCDC_SampleDB_Incremental.sql then applies exactly:
update product 1001, delete product 1002, insert store 1009, and new
orders rows. This drives the controller over the same three tables and
pins the lake state the reference's walkthrough produces.
"""

import pytest
import os
import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.pipeline import controller
from aws_big_data_blog_dmscdc_walkthrough_spark.state.store import JsonStateStore


def _land(spark, df, path, name):
    tmp = f"{path}/_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    import glob, shutil

    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.rename(src, f"{path}/{name}")
    shutil.rmtree(tmp)


@pytest.mark.slow
def test_sampledb_walkthrough(spark, tmp_path):
    landing, lake = str(tmp_path / "landing"), str(tmp_path / "lake")
    store_p = f"{landing}/sampledb/store"
    product_p = f"{landing}/sampledb/product"
    orders_p = f"{landing}/sampledb/orders"
    for p in (store_p, product_p, orders_p):
        os.makedirs(p)

    _land(
        spark,
        spark.createDataFrame(
            [(1001, "320 W. 100th Ave", "Anchorage", "AK"),
             (1002, "1005 E Dimond Blvd", "Anchorage", "AK"),
             (1008, "3640 W. Anthem Way", "Anthem", "AZ")],
            "id int, address1 string, city string, state string",
        ),
        store_p, "LOAD00000001.parquet",
    )
    _land(
        spark,
        spark.createDataFrame(
            [(1001, "Fire 7", "Amazon Devices", "Fire Tablets", Decimal("39.00")),
             (1002, "Fire HD 8", "Amazon Devices", "Fire Tablets", Decimal("89.00")),
             (1010, "Kindle", "Amazon Devices", "Kindle E-readers", Decimal("79.00"))],
            "id int, name string, dept string, category string, price decimal(10,2)",
        ),
        product_p, "LOAD00000001.parquet",
    )
    _land(
        spark,
        spark.createDataFrame(
            [(1, 1001, 1001, dt.date(2024, 1, 1)), (2, 1002, 1008, dt.date(2024, 1, 2))],
            "orderid int, productid int, storeid int, orderdate date",
        ),
        orders_p, "LOAD00000001.parquet",
    )

    store = JsonStateStore(str(tmp_path / "state.json"))
    controller.run_once(spark, landing, lake, store)  # register inactive
    for st in store.all():
        st.active = True
        st.primary_key = "id" if not st.table == "orders" else "orderid"
        if st.table == "orders":
            st.partition_key = "orderdate"
        store.put(st)

    r1 = controller.run_once(spark, landing, lake, store)
    assert all(t.did_initial for t in r1.tables)
    assert spark.read.parquet(f"{lake}/sampledb/store").count() == 3
    assert os.path.isdir(f"{lake}/sampledb/orders/orderdate=2024-01-01")

    # --- the incremental batch (DMSCDC_SampleDB_Incremental.sql)
    _land(
        spark,
        spark.createDataFrame(
            [("U", 1001, "Sample Product", "Sample Dept", "Sample Category", Decimal("39.00")),
             ("D", 1002, None, None, None, None)],
            "Op string, id int, name string, dept string, category string, price decimal(10,2)",
        ),
        product_p, "20240102-000000001.parquet",
    )
    _land(
        spark,
        spark.createDataFrame(
            [("I", 1009, "125 Technology Dr.", "Irvine", "CA")],
            "Op string, id int, address1 string, city string, state string",
        ),
        store_p, "20240102-000000001.parquet",
    )
    _land(
        spark,
        spark.createDataFrame(
            [("I", 3, 1345, 1001, dt.date(2024, 1, 3))],
            "Op string, orderid int, productid int, storeid int, orderdate date",
        ),
        orders_p, "20240102-000000001.parquet",
    )

    r2 = controller.run_once(spark, landing, lake, store)
    assert all(t.incremental_files == 1 for t in r2.tables if not t.skipped)

    product = {r.id: r for r in spark.read.parquet(f"{lake}/sampledb/product").collect()}
    assert set(product) == {1001, 1010}  # 1002 deleted
    assert product[1001].name == "Sample Product"
    assert product[1001].dept == "Sample Dept"
    assert float(product[1001].price) == 39.00  # non-updated col preserved

    store_rows = {r.id for r in spark.read.parquet(f"{lake}/sampledb/store").collect()}
    assert store_rows == {1001, 1002, 1008, 1009}

    orders = spark.read.parquet(f"{lake}/sampledb/orders")
    assert orders.count() == 3
    assert os.path.isdir(f"{lake}/sampledb/orders/orderdate=2024-01-03")

    # idempotent re-run: no new work, no state corruption
    r3 = controller.run_once(spark, landing, lake, store)
    assert all(t.incremental_files == 0 and not t.did_initial for t in r3.tables if not t.skipped)
    assert spark.read.parquet(f"{lake}/sampledb/product").count() == 2
