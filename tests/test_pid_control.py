"""PID budget controller vs a straight-line python loop, plus the
control-theoretic sanity properties: a persistently slow host loses
budget to the floor, a persistently fast one saturates at the cap,
and the integral term removes steady-state offset direction."""

from __future__ import annotations

from pixcrawler_spark.operators.control import pid_budget

TARGET, BASE = 200.0, 10.0
KP, KI, KD = 0.02, 0.005, 0.01
LO, HI = 1.0, 100.0


def _rows():
    rows = []
    # host A: consistently fast (50ms), host B: consistently slow
    # (900ms), host C: oscillating around target
    for t in range(1, 21):
        rows.append(("a", t, 50.0))
        rows.append(("b", t, 900.0))
        rows.append(("c", t, 200.0 + (80.0 if t % 2 else -80.0)))
    return rows


def _reference():
    out = {}
    series: dict[str, list[tuple[int, float]]] = {}
    for h, t, x in _rows():
        series.setdefault(h, []).append((t, x))
    for h, pts in series.items():
        integral, prev_e = 0.0, None
        for t, x in sorted(pts):
            e = TARGET - x
            integral += e
            d = 0.0 if prev_e is None else e - prev_e
            prev_e = e
            raw = BASE + KP * e + KI * integral + KD * d
            out[(h, t)] = int(min(HI, max(LO, raw)) // 1)
    return out


def test_pid_matches_reference_loop(spark):
    df = spark.createDataFrame(
        _rows(), "domain string, round int, latency_ms double"
    )
    got = {
        (r["host"], r["t"]): r["budget"]
        for r in pid_budget(
            df, target=TARGET, base=BASE, kp=KP, ki=KI, kd=KD,
            lo=LO, hi=HI,
        ).collect()
    }
    want = _reference()
    assert got == want


def test_pid_control_properties(spark):
    df = spark.createDataFrame(
        _rows(), "domain string, round int, latency_ms double"
    )
    pdf = pid_budget(
        df, target=TARGET, base=BASE, kp=KP, ki=KI, kd=KD, lo=LO, hi=HI
    ).toPandas()
    a = pdf[pdf.host == "a"].sort_values("t")["budget"]
    b = pdf[pdf.host == "b"].sort_values("t")["budget"]
    # fast host's budget is non-decreasing and ends above base
    assert a.is_monotonic_increasing
    assert a.iloc[-1] > BASE
    # slow host drains to the floor and stays there
    assert b.iloc[-1] == int(LO)
    assert (b.diff().dropna() <= 0).all()


def test_streaming_pid_matches_batch_tail(spark, tmp_path):
    """The stateful streaming PID folded across two availableNow
    drains (shared checkpoint -> one query restart) ends at the same
    (integral, budget) as the batch operator's last row per host."""
    from pyspark.sql import Window, functions as F

    from pixcrawler_spark.streaming.ingest import (
        hostload_pid_stream,
        run_available_now,
    )

    df = spark.createDataFrame(
        _rows(), "domain string, round int, latency_ms double"
    )
    batch_tail = {
        r["host"]: (round(r["integral"], 6), r["budget"])
        for r in pid_budget(
            df, target=TARGET, base=BASE, kp=KP, ki=KI, kd=KD,
            lo=LO, hi=HI,
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("host").orderBy(F.col("t").desc())
            ),
        )
        .where("_rn = 1")
        .collect()
    }

    obs = df.select(
        "domain",
        "latency_ms",
        F.timestamp_seconds(F.col("round") * 60).alias("ts"),
        F.col("round").cast("long").alias("event_id"),
    )
    parts = [obs.where("round <= 10"), obs.where("round > 10")]
    src = tmp_path / "pid_src"
    out, ckpt = str(tmp_path / "pid_out"), str(tmp_path / "pid_ckpt")
    src.mkdir()
    for i, part in enumerate(parts):
        part.coalesce(1).write.parquet(str(src / f"b{i}"))
        stream = spark.readStream.schema(
            "domain string, latency_ms double, ts timestamp, event_id long"
        ).parquet(f"{src}/*")
        run_available_now(
            hostload_pid_stream(
                stream, target=TARGET, base=BASE, kp=KP, ki=KI,
                kd=KD, lo=LO, hi=HI,
            ),
            out,
            ckpt,
        )
    got = spark.read.parquet(out).toPandas()
    final = (
        got.sort_values("n_obs").groupby("domain").tail(1).set_index("domain")
    )
    for h, (want_i, want_b) in batch_tail.items():
        assert abs(final.loc[h, "integral"] - want_i) < 1e-6, h
        assert final.loc[h, "budget"] == want_b, h
