"""MVCC concurrency stress tests (ref: test/lib/concurrency/
stress_test.cpp — many clients hammering inserts/updates with conflict
detection; scheduler tests over the fake-NUMA topology)."""

import threading

import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.scheduler.scheduler import NodeQueueScheduler
from hyrise_tpu.scheduler.tasks import JobTask
from hyrise_tpu.scheduler.topology import Topology
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, TransactionConflict, sql


def test_concurrent_inserts_all_committed():
    db = Database.get()
    sql("CREATE TABLE bank (acct INT, amount INT)")
    n_threads = 8
    per_thread = 10
    errors = []

    def worker(tid):
        try:
            for i in range(per_thread):
                sql(f"INSERT INTO bank VALUES ({tid}, {i})")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert sql("SELECT COUNT(*) FROM bank").to_pylist() == [(n_threads * per_thread,)]
    # per-thread counts intact
    rows = sorted(sql(
        "SELECT acct, COUNT(*) FROM bank GROUP BY acct"
    ).to_pylist())
    assert rows == [(t, per_thread) for t in range(n_threads)]


def test_write_write_conflict_rolls_back():
    db = Database.get()
    sql("CREATE TABLE cnt (v INT)")
    sql("INSERT INTO cnt VALUES (0)")
    tm = db.transaction_manager

    # two explicit transactions updating the same row: the second must
    # conflict on the CAS-locked tid (ref: mvcc_data.hpp:40-41)
    ctx1 = tm.new_transaction_context()
    ctx2 = tm.new_transaction_context()
    SQLPipelineBuilder("UPDATE cnt SET v = 1").with_transaction_context(
        ctx1
    ).create_pipeline().get_result_tables()
    with pytest.raises(TransactionConflict):
        SQLPipelineBuilder("UPDATE cnt SET v = 2").with_transaction_context(
            ctx2
        ).create_pipeline().get_result_tables()
    ctx1.commit()
    assert sql("SELECT v FROM cnt").to_pylist() == [(1,)]


def test_snapshot_isolation():
    db = Database.get()
    sql("CREATE TABLE snap (v INT)")
    sql("INSERT INTO snap VALUES (1)")
    tm = db.transaction_manager
    reader = tm.new_transaction_context()
    # a later committed insert must stay invisible to the old snapshot
    sql("INSERT INTO snap VALUES (2)")
    rows = SQLPipelineBuilder("SELECT COUNT(*) FROM snap") \
        .with_transaction_context(reader).create_pipeline() \
        .get_result_table().to_pylist()
    assert rows == [(1,)]
    reader.rollback()
    assert sql("SELECT COUNT(*) FROM snap").to_pylist() == [(2,)]


def test_concurrent_update_mix():
    sql("CREATE TABLE items (id INT, n INT)")
    values = ", ".join(f"({i}, 0)" for i in range(16))
    sql(f"INSERT INTO items VALUES {values}")
    committed = []
    lock = threading.Lock()

    def bump(row):
        ok = 0
        for _ in range(5):
            try:
                sql(f"UPDATE items SET n = n + 1 WHERE id = {row}")
                ok += 1
            except TransactionConflict:
                pass
        with lock:
            committed.append((row, ok))

    threads = [threading.Thread(target=bump, args=(i % 4,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total_committed = sum(ok for _, ok in committed)
    total_n = sql("SELECT SUM(n) FROM items").to_pylist()[0][0]
    assert total_n == total_committed  # every committed bump is visible


def test_node_queue_scheduler_runs_job_dag():
    scheduler = NodeQueueScheduler(Topology.use_fake_numa_topology(8, 2))
    try:
        results = []
        lock = threading.Lock()

        def make(i):
            def fn():
                with lock:
                    results.append(i)
            return fn

        first = [JobTask(make(i)) for i in range(8)]
        barrier = JobTask(make(100))
        for t in first:
            t.set_as_predecessor_of(barrier)
        after = [JobTask(make(200 + i)) for i in range(4)]
        for t in after:
            barrier.set_as_predecessor_of(t)
        scheduler.schedule_and_wait_for_tasks(first + [barrier] + after)
        assert set(results) == set(range(8)) | {100} | {200 + i for i in range(4)}
        # barrier ordering respected
        assert results.index(100) > max(results.index(i) for i in range(8))
    finally:
        scheduler.finish()
