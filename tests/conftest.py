import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("scrapy-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.default.parallelism", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", "8g")
        # one session serves the whole suite (thousands of jobs): cap the
        # status-store retention or the driver heap fills with dead
        # execution/stage bookkeeping — each retained SQL execution pins
        # its full plan graph, and engine epochs build deep MOR-chain
        # plans (observed: heap OOM in the last parity test of the file
        # with the default retainedExecutions=1000)
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.ui.retainedJobs", "64")
        .config("spark.ui.retainedStages", "128")
        .config("spark.ui.retainedTasks", "2000")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
