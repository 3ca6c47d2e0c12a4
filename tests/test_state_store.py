"""JsonStateStore concurrency: the controller's thread pool calls put()
concurrently; a slow flush must never clobber a newer table's mark
(reference parity: DynamoDB gives per-item atomic puts,
DMSCDC_Controller.py:94-100)."""

import json
import threading

from aws_big_data_blog_dmscdc_walkthrough_spark.state.store import (
    JsonStateStore,
    TableState,
)


def test_threaded_put_storm_loses_no_updates(tmp_path):
    path = str(tmp_path / "state.json")
    store = JsonStateStore(path)
    n_tables, n_rounds = 16, 25

    def worker(i):
        for r in range(n_rounds):
            store.put(
                TableState(path=f"t{i}", last_incremental_file=f"f{r:04d}")
            )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_tables)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # in-memory view and the durable file both hold every table's final mark
    final = {s.path: s.last_incremental_file for s in store.all()}
    assert final == {f"t{i}": f"f{n_rounds - 1:04d}" for i in range(n_tables)}
    on_disk = json.load(open(path))
    assert {p: rec["last_incremental_file"] for p, rec in on_disk.items()} == final


def test_reload_after_storm_matches(tmp_path):
    path = str(tmp_path / "state.json")
    store = JsonStateStore(path)
    store.put(TableState(path="a", last_incremental_file="x"))
    store.put(TableState(path="b", last_incremental_file="y"))
    reloaded = JsonStateStore(path)
    assert {s.path for s in reloaded.all()} == {"a", "b"}
    assert reloaded.get("a").last_incremental_file == "x"
