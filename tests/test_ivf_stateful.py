"""IVF ANN determinism/recall + applyInPandasWithState operator."""

from pyspark.sql import functions as F

from popelines_spark.llm.ivf import knn_ivf, train_centroids


def _clustered_vecs(spark):
    # 3 tight clusters around axis-ish directions in R^8
    rows = []
    for c, base in enumerate(([1, 0, 0], [0, 1, 0], [0, 0, 1])):
        for i in range(10):
            v = [0.0] * 8
            v[c] = 1.0
            v[3 + c] = 0.05 * i  # slight spread, deterministic
            rows.append((c * 100 + i, v))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_ivf_finds_same_cluster_neighbors(spark):
    vecs = _clustered_vecs(spark)
    corpus = vecs.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    cents = train_centroids(corpus, "c_vec", n_cells=3, iterations=2, id_col="c_id")
    assert len(cents) == 3
    q = vecs.filter(F.col("vec_id") == 105).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec"))
    out = knn_ivf(q, corpus, k=3, centroids=cents, n_probe=1)
    got = [r.c_id for r in sorted(out.collect(), key=lambda r: r.rank)]
    assert all(100 <= c < 200 for c in got)  # same cluster only
    # deterministic across repartitioning
    cents2 = train_centroids(corpus.repartition(5), "c_vec", n_cells=3,
                             iterations=2, id_col="c_id")
    assert cents == cents2


def test_stateful_running_totals(spark, scratch):
    import datetime as dt

    from popelines_spark.streaming.runner import run_to_completion
    from popelines_spark.streaming.stateful import running_user_totals

    src = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1, 0, m), float(m)) for m in range(5)]
        + [(2, dt.datetime(2020, 1, 1, 1, 0), 10.0)],
        "user_id long, ts timestamp, value double",
    )
    src.write.parquet(f"{scratch}/ev")
    stream = spark.readStream.schema(src.schema).parquet(f"{scratch}/ev")
    out = run_to_completion(running_user_totals(stream), "update")
    rows = {r.user_id: r for r in out.collect()}
    assert rows[1].n_events == 5 and rows[1].total_cents == 1000
    assert rows[2].n_events == 1 and rows[2].total_cents == 1000
    assert rows[1].last_ts_us == int(dt.datetime(2020, 1, 1, 0, 4).timestamp() * 1e6)


def test_foreach_batch_exactly_once_sink(spark, scratch):
    """foreachBatch + idempotent write: re-delivered micro-batches must not
    duplicate output (the exactly-once sink pattern for non-transactional
    stores)."""
    import datetime as dt
    import os

    src = spark.createDataFrame(
        [(i, dt.datetime(2020, 1, 1, 0, i), float(i)) for i in range(20)],
        "event_id long, ts timestamp, value double",
    )
    src.write.parquet(f"{scratch}/src")
    out_dir = f"{scratch}/sink"

    def write_batch(df, epoch_id):
        # idempotence: the epoch id keys the output path; a retry of the
        # same epoch overwrites rather than appends
        df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    stream = spark.readStream.schema(src.schema).parquet(f"{scratch}/src")
    q = stream.writeStream.foreachBatch(write_batch).start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    first = spark.read.parquet(out_dir).count()
    # simulate a redelivery of epoch 0
    write_batch(spark.read.parquet(f"{scratch}/src"), 0)
    assert spark.read.parquet(out_dir).count() == first == 20


def test_ivf_auto_cell_sizing(spark, scratch):
    from popelines_spark.llm.ivf import build_ivf_index, load_ivf_index
    from popelines_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    idx = build_ivf_index(
        emb, "embedding", "vec_id", f"{scratch}/ivf_auto", n_cells="auto"
    )
    expected = max(16, int(n**0.5))
    assert len(idx.centroids) == expected
    back = load_ivf_index(spark, f"{scratch}/ivf_auto")
    assert len(back.centroids) == expected


def test_train_centroids_rejects_bad_seed(spark):
    """ADVICE r6: a typo'd seed must raise, not silently fall back to
    lowest-id (the seeding-collapse failure mode)."""
    import pytest

    from popelines_spark.llm.ivf import train_centroids

    corpus = _clustered_vecs(spark).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    for bad in ("Hash", "xxhash", "random"):
        with pytest.raises(ValueError, match="seed must be"):
            train_centroids(corpus, "c_vec", n_cells=3, iterations=1,
                            id_col="c_id", seed=bad)


def test_train_centroids_sample_cap(spark):
    """Sampled Lloyd training (VERDICT r6 next #3): with sample_cap set the
    iterations run over a deterministic hash-mod subset; the result is still
    bit-identical across input partitionings, and a cap >= N degenerates to
    full-corpus training."""
    from popelines_spark.llm.ivf import train_centroids

    vecs = spark.range(1, 901).select(
        F.col("id").alias("c_id"),
        F.array(
            *[((F.col("id") * (i + 3)) % 101 + 1).cast("double")
              for i in range(8)]
        ).alias("c_vec"),
    )
    full = train_centroids(vecs, "c_vec", n_cells=4, iterations=2,
                           id_col="c_id", seed="hash")
    # cap >= N: mod == 1, identical to full training
    capped_hi = train_centroids(vecs, "c_vec", n_cells=4, iterations=2,
                                id_col="c_id", seed="hash", sample_cap=900)
    assert full == capped_hi
    # cap < N: trains on ~1/3 of rows; deterministic across repartitioning
    s1 = train_centroids(vecs, "c_vec", n_cells=4, iterations=2,
                         id_col="c_id", seed="hash", sample_cap=300)
    s2 = train_centroids(vecs.repartition(7), "c_vec", n_cells=4,
                         iterations=2, id_col="c_id", seed="hash",
                         sample_cap=300)
    assert s1 == s2
    # k-means-lite drops cells that go empty (pre-existing contract), so
    # the sampled run may end with fewer than n_cells centroids
    assert 1 <= len(s1) <= 4
    assert s1 != full  # the sample genuinely changed the training input


def test_streaming_restart_from_checkpoint_exactly_once(spark, scratch):
    """Recovery semantics: a stateful streaming agg stopped mid-source and
    restarted with the SAME checkpointLocation resumes from the recorded
    offsets — files processed before the stop are not re-counted, files
    added while down are picked up, totals equal the batch answer."""
    import datetime as dt
    import glob
    import os
    import shutil

    src = f"{scratch}/src"
    ckpt = f"{scratch}/ckpt"
    out = f"{scratch}/out"
    os.makedirs(src)

    def write_file(idx, n_rows):
        rows = [
            (idx * 1000 + j, dt.datetime(2024, 1, 1, idx, j % 60), 1.0)
            for j in range(n_rows)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double"
        )
        tmp = f"{src}/_stage{idx}"
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.rename(part, f"{src}/{idx}.parquet")
        shutil.rmtree(tmp)

    write_file(0, 30)
    write_file(1, 20)
    schema = "event_id long, ts timestamp, value double"

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = stream.groupBy().agg(
            __import__("pyspark").sql.functions.count("*").alias("n")
        )

        def sink(df, epoch_id):
            df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

        return (
            agg.writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    # down-time: two more files arrive
    write_file(2, 25)
    write_file(3, 5)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()
    # the LAST epoch's complete-mode total must equal the batch answer —
    # offsets resumed, nothing double-counted, nothing dropped
    epochs = sorted(
        int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("epoch=")
    )
    final = spark.read.parquet(f"{out}/epoch={epochs[-1]}").collect()[0].n
    assert final == 80
    # and the restart genuinely continued the epoch sequence rather than
    # replaying from zero
    assert len(epochs) >= 3
