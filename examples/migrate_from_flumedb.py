"""Side-by-side migration: the reference's README example, re-expressed.

The flumedb README (`/root/reference/README.md:53-75`) shows the
canonical program:

    // JavaScript (flumedb)
    var db = Flume(Log(file, {codec: 'json'}))
      .use('sum', Reduce(1, function (acc, item) {
        return (acc || 0) + item.foo
      }))
    db.append({foo: 1}, function (err, seq) {
      db.sum.get(function (err, value) {
        console.log(value) // 1  -- the view HAS folded seq 0 by now
      })
    })

The same program here — identical semantics (dense seqs, gated
read-your-writes view reads, versioned views), Spark execution:

Run: PYTHONPATH=/root/repo python examples/migrate_from_flumedb.py
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import flumedb_spark as fs
from flumedb_spark.streaming.supervisor import ViewSupervisor
from flumedb_spark.views.grouped import GroupedStats
from flumedb_spark.views.level import Level
from flumedb_spark.views.search import Search


def main() -> None:
    spark = fs.get_spark("migration_demo", cpus=8)
    root = tempfile.mkdtemp(prefix="flume_demo_")

    # Flume(Log(file, {codec: 'json'})).use('sum', Reduce(1, fn))
    db = fs.Flume(fs.ParquetLog(f"{root}/db", codec="json"), spark=spark)
    db.use("sum", fs.Reduce(1, lambda acc, item: (acc or 0) + item["foo"]))

    # db.append({foo: 1}, cb) ... db.sum.get(cb) -> 1
    seq = db.append({"foo": 1})
    print(f"appended seq={seq}, db.since={db.since}")
    print(f"db.sum.get() -> {db.sum.get()}  (gated: view has folded seq 0)")

    # the wider view surface the flume ecosystem provides:
    db.use("by_tag", Level(2, key_fn=lambda v: v.get("tags", [])))
    db.use("ft", Search(1, text_field="text"))
    db.use("stats_by_kind", GroupedStats(1, "get_json_object(value, '$.kind')", field="foo"))
    db.append(
        [
            {"foo": 2, "kind": "a", "tags": ["x"], "text": "hello log world"},
            {"foo": 3, "kind": "b", "tags": ["x", "y"], "text": "the log abides"},
        ]
    )
    print("sum ->", db.sum.get())
    print("by_tag['x'] ->", [h["seq"] for h in db.by_tag.get("x")])
    print("search 'log' ->", [h["seq"] for h in db.ft.query("log")])
    print("stats_by_kind['a'] ->", db.stats_by_kind.get("a"))

    # SQL over everything
    db.sql("SELECT count(*) AS n FROM log").show()

    # always-on maintenance (the streaming form of the view feed);
    # auto_compact also runs the cost-based OPTIMIZE/VACUUM maintenance
    sup = ViewSupervisor(db, auto_compact=True).start()
    db.append({"foo": 10, "kind": "a", "tags": [], "text": ""})
    sup.process_all_available()
    print("after live append, stale read ->", db.sum.get(since=-1))
    sup.stop()

    # one-shot maintenance: compact when due, vacuum past retention
    print("maintain ->", db.maintain())

    # rebuild: blow the views away, replay the log (README.md:159-165)
    db.rebuild()
    print("after rebuild, sum ->", db.sum.get())
    db.close()
    print("OK")


if __name__ == "__main__":
    main()
