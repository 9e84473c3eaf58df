"""Object-store (s3a) session conf wiring — testable without any cloud
network: confs are inert strings until a filesystem access happens."""

from __future__ import annotations

import pytest

from end_to_end_sales_etl_de_project_spark.session import object_store_conf


def test_default_is_credential_chain_and_magic_committer():
    conf = object_store_conf()
    assert "access.key" not in " ".join(conf)  # no static keys by default
    assert (
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"]
        == "com.amazonaws.auth.EnvironmentVariableCredentialsProvider,"
        "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider"
    )
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.sql.sources.commitProtocolClass"].endswith(
        "PathOutputCommitProtocol"
    )
    # all keys must be spark-prefixed (hadoop confs go through spark.hadoop.*)
    assert all(k.startswith("spark.") for k in conf)
    assert all(isinstance(v, str) for v in conf.values())


def test_access_key_without_secret_rejected():
    with pytest.raises(ValueError, match="secret_key"):
        object_store_conf(access_key="AKIA...")


def test_static_keys_pin_simple_provider():
    conf = object_store_conf(access_key="AKIA...", secret_key="s3cr3t")
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AKIA..."
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "s3cr3t"
    assert (
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"]
        == "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    )


def test_dev_endpoint_forces_path_style():
    conf = object_store_conf(endpoint="http://localhost:9000")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"


def test_file_committer_drops_magic_confs():
    conf = object_store_conf(committer="file")
    assert "spark.hadoop.fs.s3a.committer.name" not in conf
    with pytest.raises(ValueError):
        object_store_conf(committer="rename")


def test_confs_apply_to_fresh_session():
    """End-to-end wiring: a FRESH session built with the preset exposes
    every fs.s3a.* value through its Hadoop configuration. Needs its own
    JVM (getOrCreate would reuse the test-session without applying new
    confs), so it runs in a subprocess — ~15 s, the one real check that
    the strings reach the filesystem layer."""
    import os
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, {repo!r})
from end_to_end_sales_etl_de_project_spark.session import get_spark_session, object_store_conf
conf = object_store_conf(endpoint="http://localhost:9000")
spark = get_spark_session(app_name="s3a-wiring", master="local[1]", extra_conf=conf)
hconf = spark.sparkContext._jsc.hadoopConfiguration()
for k, v in conf.items():
    if k.startswith("spark.hadoop."):
        assert hconf.get(k[len("spark.hadoop."):]) == v, k
# read via SparkConf, not spark.conf: the SQLConf getter tries to load the
# committer class, which is only on the classpath in cloud deployments
assert spark.sparkContext.getConf().get("spark.sql.sources.commitProtocolClass").endswith("PathOutputCommitProtocol")
print("WIRED-OK")
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=180
    )
    assert "WIRED-OK" in out.stdout, out.stderr[-2000:]
