"""Plan-level verification of the JDBC staging sink/scan (S7/S8).

The container has no RDBMS, so these tests pin the option sets and
bound-query construction that Spark's JDBC source consumes — the parts
that decide batching, parallelism, and save semantics at scale.
"""

import pytest

from _multi_source_retail_data_integration_hub_spark.sources import sinks

URL = "jdbc:mysql://staging:3306/retail"


def test_jdbc_write_options_batchsize_and_overrides():
    opts = sinks.jdbc_write_options(
        URL, "staging_sales", batch_size=5000, options={"isolationLevel": "READ_COMMITTED"}
    )
    assert opts == {
        "url": URL,
        "dbtable": "staging_sales",
        "batchsize": "5000",
        "isolationLevel": "READ_COMMITTED",
    }
    # default batch size is the reference's bulk-load replacement
    assert sinks.jdbc_write_options(URL, "t")["batchsize"] == "10000"


def test_jdbc_bounds_query_shape():
    q = sinks.jdbc_bounds_query("staging_sales", "sale_id")
    assert q == '(SELECT MIN("sale_id") AS lo, MAX("sale_id") AS hi FROM staging_sales) AS b'
    q_mysql = sinks.jdbc_bounds_query("staging_sales", "sale_id", quote="`")
    assert q_mysql == "(SELECT MIN(`sale_id`) AS lo, MAX(`sale_id`) AS hi FROM staging_sales) AS b"


def test_jdbc_read_options_partitioned():
    opts = sinks.jdbc_read_options(
        URL, "staging_sales", "sale_id", lower_bound=1, upper_bound=99_999, num_partitions=16
    )
    assert opts["partitionColumn"] == "sale_id"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "99999"
    assert opts["numPartitions"] == "16"


def test_jdbc_read_options_unpartitioned_has_no_split_keys():
    opts = sinks.jdbc_read_options(URL, "staging_sales")
    assert set(opts) == {"url", "dbtable"}


def test_jdbc_read_options_partition_without_bounds_raises():
    with pytest.raises(ValueError, match="bounds"):
        sinks.jdbc_read_options(URL, "t", "sale_id")


def test_dialect_quote_by_url():
    assert sinks._dialect_quote("jdbc:mysql://h:3306/db") == "`"
    assert sinks._dialect_quote("jdbc:mariadb://h/db") == "`"
    assert sinks._dialect_quote("jdbc:derby:/tmp/db") == '"'
    assert sinks._dialect_quote("jdbc:postgresql://h/db") == '"'
