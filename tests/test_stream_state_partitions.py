"""Contract of streaming/jobs._state_partitions: scope the session's
shuffle-partition conf down to the streaming state sizing for the
stream's lifetime, restore it afterwards — including on error — and
never RAISE a session that already runs smaller (no Spark needed:
the context manager only touches spark.conf get/set)."""

from __future__ import annotations

import pytest

from taps_spark.streaming.jobs import STREAM_STATE_PARTITIONS, _state_partitions


class _FakeConf:
    def __init__(self, value: str):
        self._v = {"spark.sql.shuffle.partitions": value}

    def get(self, key):
        return self._v[key]

    def set(self, key, value):
        self._v[key] = value


class _FakeSpark:
    def __init__(self, value: str):
        self.conf = _FakeConf(value)


def test_caps_large_session_and_restores():
    spark = _FakeSpark("32")
    with _state_partitions(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            STREAM_STATE_PARTITIONS
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"


def test_never_raises_a_smaller_session():
    spark = _FakeSpark("4")
    with _state_partitions(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4"


def test_restores_on_error():
    spark = _FakeSpark("32")
    with pytest.raises(RuntimeError):
        with _state_partitions(spark):
            raise RuntimeError("stream blew up")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"


def test_non_numeric_conf_gets_the_cap():
    # AQE "auto" style values: apply the cap rather than crash.
    spark = _FakeSpark("auto")
    with _state_partitions(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            STREAM_STATE_PARTITIONS
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == "auto"
