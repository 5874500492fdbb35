"""Pluggable lakehouse interface (VERDICT r9 stretch item 8).

The parquet-manifest implementation is exercised fully here; the Delta
adapter runs the IDENTICAL parity body when delta-spark is installed
(not in this sandbox — the test skips, like the env-gated RPC soak).
"""

from __future__ import annotations

import os

import pytest

from block_data_fetcher_spark import lakehouse


def _has_delta() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


_ICEBERG_ON_CLASSPATH: bool | None = None


def _has_iceberg(spark) -> bool:
    global _ICEBERG_ON_CLASSPATH
    if _ICEBERG_ON_CLASSPATH is None:
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            _ICEBERG_ON_CLASSPATH = True
        except Exception:
            _ICEBERG_ON_CLASSPATH = False
    return _ICEBERG_ON_CLASSPATH


def _impl_params():
    params = [pytest.param("parquet", id="parquet")]
    params.append(
        pytest.param(
            "delta",
            id="delta",
            marks=pytest.mark.skipif(
                not _has_delta(), reason="delta-spark not installed"
            ),
        )
    )
    params.append(pytest.param("iceberg", id="iceberg"))
    return params


def _skip_unless_available(spark, impl) -> None:
    # iceberg's gate needs a live JVM, so it can't be a collection-time
    # skipif mark like delta's import check
    if impl == "iceberg" and not _has_iceberg(spark):
        pytest.skip("iceberg-spark-runtime not on classpath")


@pytest.mark.parametrize("impl", _impl_params())
def test_lakehouse_commit_read_time_travel(spark, sf_dir, tmp_path, impl):
    _skip_unless_available(spark, impl)
    t = lakehouse.open_table(spark, str(tmp_path / "t"), impl=impl)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )
    v1_df = ev.where("event_id % 3 = 0")
    v2_df = ev.where("event_id % 3 <= 1")

    v1 = t.commit(v1_df)
    v2 = t.commit(v2_df)
    assert t.versions()[-2:] == [v1, v2]

    # latest read == v2, versioned read == v1, exactly
    assert t.read().count() == v2_df.count()
    assert t.read(v1).count() == v1_df.count()
    got_v1 = sorted(tuple(r) for r in t.read(v1).collect())
    want_v1 = sorted(tuple(r) for r in v1_df.collect())
    assert got_v1 == want_v1


@pytest.mark.parametrize("impl", _impl_params())
def test_lakehouse_changes_cdc(spark, sf_dir, tmp_path, impl):
    _skip_unless_available(spark, impl)
    from pyspark.sql import functions as F

    t = lakehouse.open_table(spark, str(tmp_path / "t"), impl=impl)
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "user_id", "value")
        .where("event_id < 100")
    )
    v1 = t.commit(ev.where("event_id < 90"))
    # v2: 10 inserts (90..99), one update (event_id 0), one delete (1)
    v2_df = (
        ev.where("event_id != 1").withColumn(
            "value",
            F.when(F.col("event_id") == 0, F.lit(-1.0)).otherwise(
                F.col("value")
            ),
        )
    )
    v2 = t.commit(v2_df)

    ch = t.changes(["event_id"], v1, v2)
    by_op = {
        r["op"]: r["n"]
        for r in ch.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    assert by_op == {"insert": 10, "delete": 1, "update_postimage": 1}
    upd = ch.where("op = 'update_postimage'").collect()
    assert len(upd) == 1 and upd[0]["event_id"] == 0 and upd[0]["value"] == -1.0


@pytest.mark.parametrize("impl", _impl_params())
def test_lakehouse_expire_keeps_survivors_exact(spark, sf_dir, tmp_path, impl):
    _skip_unless_available(spark, impl)
    t = lakehouse.open_table(spark, str(tmp_path / "t"), impl=impl)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "value"
    )
    t.commit(ev.where("event_id % 4 = 0"))
    t.commit(ev.where("event_id % 4 <= 1"))
    v3_df = ev.where("event_id % 4 <= 2")
    v3 = t.commit(v3_df)

    ck = "spark.databricks.delta.retentionDurationCheck.enabled"
    ck_before = spark.conf.get(ck, None)
    vs_before = t.versions()
    reclaimed = t.expire(keep=2)
    # expire must not leak its safety-check override into the session
    assert spark.conf.get(ck, None) == ck_before
    # Contract parity for BOTH impls (ADVICE r10 medium: the delta
    # adapter's vacuum(0) broke time travel for KEPT versions and the
    # parity test never noticed because these asserts were
    # parquet-only): exactly the newest two versions survive, expired
    # reads raise KeyError, and files exclusive to the expired
    # version were reclaimed.
    assert reclaimed > 0
    assert t.versions() == vs_before[-2:]
    with pytest.raises(KeyError):
        t.read(vs_before[0])
    # BOTH survivors still read exactly (the kept-but-not-latest one
    # is what a latest-snapshot-only vacuum silently destroys)
    v2_kept = t.versions()[0]
    assert t.read(v2_kept).count() == ev.where("event_id % 4 <= 1").count()
    assert sorted(tuple(r) for r in t.read(v3).collect()) == sorted(
        tuple(r) for r in v3_df.collect()
    )


def test_lakehouse_factory_env_gate(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("BDF_LAKEHOUSE_IMPL", raising=False)
    t = lakehouse.open_table(spark, str(tmp_path / "a"))
    assert isinstance(t, lakehouse.ParquetManifestTable)
    monkeypatch.setenv("BDF_LAKEHOUSE_IMPL", "parquet")
    assert isinstance(
        lakehouse.open_table(spark, str(tmp_path / "b")),
        lakehouse.ParquetManifestTable,
    )
    if not _has_delta():
        monkeypatch.setenv("BDF_LAKEHOUSE_IMPL", "delta")
        with pytest.raises(RuntimeError, match="delta-spark"):
            lakehouse.open_table(spark, str(tmp_path / "c"))
    if not _has_iceberg(spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            lakehouse.open_table(spark, str(tmp_path / "e"), impl="iceberg")
    with pytest.raises(ValueError):
        lakehouse.open_table(spark, str(tmp_path / "d"), impl="hudi")


def test_parquet_manifest_atomic_and_cow_safe(spark, sf_dir, tmp_path):
    """expire must be reference-counted, not version-dir-blind: a
    manifest that REUSES another version's file (the COW shape) keeps
    that file alive as long as any surviving version lists it."""
    import json

    t = lakehouse.ParquetManifestTable(spark, str(tmp_path / "t"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "value"
    )
    t.commit(ev.where("event_id < 50"))
    t.commit(ev.where("event_id < 60"))
    # synthesize a COW v3 that reuses v1's files verbatim
    m = t._manifest()
    m["3"] = m["1"]
    t._write_manifest(m)

    reclaimed = t.expire(keep=2)  # keeps v2 + v3(=v1's files)
    assert t.versions() == [2, 3]
    # v1's files survived because v3 references them
    assert t.read(3).count() == ev.where("event_id < 50").count()
    assert reclaimed == 0  # nothing was exclusively dead


def test_changes_detects_null_transitions(spark, tmp_path):
    """A field moving to/from NULL is an update: the diff uses a
    null-safe struct compare (plain != returns NULL there and would
    silently drop the row from the CDC feed)."""
    t = lakehouse.ParquetManifestTable(spark, str(tmp_path / "t"))
    v1 = t.commit(
        spark.createDataFrame([(1, 10.0), (2, None), (3, 3.0)], "k int, v double")
    )
    v2 = t.commit(
        spark.createDataFrame([(1, None), (2, 20.0), (3, 3.0)], "k int, v double")
    )
    ch = {r["k"]: r["op"] for r in t.changes(["k"], v1, v2).collect()}
    assert ch == {1: "update_postimage", 2: "update_postimage"}
