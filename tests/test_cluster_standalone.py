"""Multi-node execution semantics on a REAL standalone cluster
(ROADMAP #8): a master + two 4-core worker JVMs launched on localhost,
a driver connecting over spark://, executors in separate processes with
network shuffle between them — the behaviors `local[N]` cannot exercise
(separate-JVM broadcast, cross-executor shuffle fetch, executor loss
and task re-execution).

One SparkContext per process: the cluster DRIVER runs as a separate
python subprocess (the pytest process already owns the local[N]
context), prints a JSON result sentinel, and the host test compares it
against the same query on the local session — results must be EXACT
across topologies, not merely complete.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

import pyspark

SPARK_HOME = os.path.dirname(pyspark.__file__)
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
SF = "/root/testdata/sf0.001"

DRIVER_PRELUDE = """
import json, os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
url = sys.argv[1]
spark = (
    SparkSession.builder.master(url)
    .appName("cluster_driver")
    .config("spark.executor.memory", "2g")
    .config("spark.executor.cores", "4")
    .config("spark.cores.max", "8")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executorEnv.PYTHONPATH", "/root/repo")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "16m")
    .config("spark.sql.files.maxPartitionBytes", "1m")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import time as _t
t0 = _t.time()
while _t.time() - t0 < 60:
    infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
    if len(infos) >= 3:  # driver + 2 executors
        break
    _t.sleep(0.5)
else:
    raise TimeoutError("cluster never reached 2 executors")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_log(path: str, needle: str, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path) and needle in open(path, errors="replace").read():
            return
        time.sleep(0.5)
    raise TimeoutError(f"'{needle}' not seen in {path}")


def _run_driver(tmp_path, url: str, body: str, timeout: int = 300) -> dict:
    """Run a cluster-driver python subprocess; returns its sentinel."""
    script = tmp_path / "driver.py"
    script.write_text(DRIVER_PRELUDE + body)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, str(script), url],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert out.returncode == 0, f"driver failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT sentinel in driver output:\n{out.stdout[-2000:]}")


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    """master + 2 workers as real OS processes; yields (master_url,
    worker Popen list) and tears the daemons down."""
    tmp = tmp_path_factory.mktemp("standalone")
    port = _free_port()
    env = dict(os.environ)
    env["SPARK_HOME"] = SPARK_HOME
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_WORKER_DIR"] = str(tmp / "work")
    env["SPARK_LOG_DIR"] = str(tmp / "logs")

    def launch(name: str, *args: str) -> subprocess.Popen:
        log = open(tmp / f"{name}.log", "w")
        return subprocess.Popen(
            [SPARK_CLASS, *args],
            stdout=log,
            stderr=subprocess.STDOUT,
            env=env,
            start_new_session=True,  # own process group: clean teardown
        )

    master = launch(
        "master",
        "org.apache.spark.deploy.master.Master",
        "--host", "127.0.0.1", "--port", str(port), "--webui-port", "0",
    )
    procs = [master]
    url = f"spark://127.0.0.1:{port}"
    try:
        _wait_log(str(tmp / "master.log"), "Successfully started service 'sparkMaster'")
        workers = []
        for i in (1, 2):
            w = launch(
                f"worker{i}",
                "org.apache.spark.deploy.worker.Worker", url,
                "--host", "127.0.0.1", "--cores", "4", "--memory", "3g",
                "--webui-port", "0",
            )
            procs.append(w)
            workers.append(w)
        for i in (1, 2):
            _wait_log(str(tmp / f"worker{i}.log"), "Successfully registered with master")
        yield url, workers
    finally:
        for p in procs:
            if p.poll() is None:
                try:
                    os.killpg(p.pid, signal.SIGTERM)
                except ProcessLookupError:
                    pass
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass


def test_shuffle_and_python_workers_across_two_executors(cluster, spark, tmp_path):
    """A join+agg query (network shuffle between separate executor
    JVMs) and an Arrow mapInPandas operator (the real multimodal
    decode) produce results identical to local[N]; python workers
    demonstrably run in BOTH worker process trees."""
    url, _workers = cluster
    got = _run_driver(
        tmp_path,
        url,
        """
from flumedb_spark import catalog
import flumedb_spark.catalog_northstar
catalog.register_tables(spark, %r)
q3 = [list(map(str, r)) for r in catalog.QUERIES["q3_top_revenue_orders"](spark, %r).collect()]
img = sorted(tuple(r) for r in catalog.QUERIES["ns_image_decode_meta"](spark, %r).collect())
img_sum = sum(r[4] for r in img)
pids = sorted(set(spark.range(0, 10000, 1, 16).rdd.map(lambda _: os.getpid()).distinct().collect()))
execs = len(spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos())
print("RESULT " + json.dumps({
    "q3": q3, "n_img": len(img), "img_sum": img_sum,
    "n_worker_pids": len(pids), "n_execs": execs,
}))
"""
        % (SF, SF, SF),
    )
    assert got["n_execs"] >= 3  # driver + 2 executors
    # python workers spread over more than one executor's process tree
    assert got["n_worker_pids"] >= 2

    from flumedb_spark import catalog
    import flumedb_spark.catalog_northstar  # noqa: F401

    catalog.register_tables(spark, SF)
    want_q3 = [
        [str(v) for v in r] for r in catalog.QUERIES["q3_top_revenue_orders"](spark, SF).collect()
    ]
    assert got["q3"] == want_q3 and len(want_q3) > 0
    img_local = catalog.QUERIES["ns_image_decode_meta"](spark, SF).collect()
    assert got["n_img"] == len(img_local) == 500
    assert got["img_sum"] == sum(r.pixel_sum for r in img_local)


def test_engine_contract_on_cluster(cluster, tmp_path):
    """The engine itself (log + gated view reads + rebuild) running
    against separate-JVM executors: append -> read-your-writes gate ->
    stream -> rebuild all behave exactly as on local[N]. The fold jobs
    and range scans execute on the cluster's executors."""
    url, _workers = cluster
    body = """
import tempfile
import flumedb_spark as fs

db = fs.Flume(tempfile.mkdtemp() + "/db", spark=spark)
db.use("sum", fs.Reduce(1, lambda a, i: (a or 0) + i["foo"]))
db.append({"foo": 1})
v1 = db.sum.get()                      # gated read-your-writes
db.append([{"foo": 2}, {"foo": 3}])
v2 = db.sum.get()
seqs = [r["seq"] for r in db.stream(seqs=True, values=True)]
rev = [r["seq"] for r in db.stream(reverse=True, limit=2, seqs=True, values=True)]
db.rebuild()
v3 = db.sum.get()                      # rebuild replays to same state
db.close()
try:
    db.append({"foo": 9}); post_close = "NO RAISE"
except Exception:
    post_close = "raised"
print("RESULT " + json.dumps({
    "v1": v1, "v2": v2, "v3": v3, "seqs": seqs, "rev": rev,
    "post_close": post_close,
}))
"""
    got = _run_driver(tmp_path, url, body)
    assert got["v1"] == 1 and got["v2"] == 6 and got["v3"] == 6
    assert got["seqs"] == [0, 1, 2] and got["rev"] == [2, 1]
    assert got["post_close"] == "raised"


def test_executor_loss_mid_job_recovers_exactly(cluster, tmp_path):
    """MUST RUN LAST in this module: it SIGKILLs worker 2 and the
    module-scoped cluster fixture does not restart it — every test
    needing two executors has to run before this one.

    Kill one worker JVM while a stretched multi-stage job is in
    flight: Spark re-schedules the lost tasks (recomputing lost shuffle
    output) on the surviving executor and the aggregate is EXACT. The
    fault-tolerance half of the 100 TB story local[N] cannot test."""
    url, workers = cluster
    body = """
from pyspark.sql import functions as F

def slow(batches):
    import time as _t
    for pdf in batches:
        _t.sleep(1.0)
        yield pdf

df = (
    spark.range(0, 20000, 1, 32)
    .withColumn("k", F.col("id") % 7)
    .mapInPandas(slow, "id long, k long")
    .groupBy("k")
    .agg(F.sum("id").alias("s"), F.count("*").alias("n"))
)
print("DRIVER_READY", flush=True)
rows = sorted([r.k, int(r.s), r.n] for r in df.collect())
assert spark.range(1000).count() == 1000  # degraded cluster still serves
print("RESULT " + json.dumps({"rows": rows}))
"""
    script = tmp_path / "driver_kill.py"
    script.write_text(DRIVER_PRELUDE + body)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, str(script), url],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
    )
    # wait for the job to be genuinely in flight, then kill worker 2
    # (its executor dies with the process group). select() guards the
    # readline so a silently-hung driver can't block past the deadline.
    import select

    out_lines: list[str] = []
    t0 = time.time()
    while time.time() - t0 < 120:
        ready, _, _ = select.select([proc.stdout], [], [], 1.0)
        if not ready:
            if proc.poll() is not None:
                break  # driver died before becoming ready
            continue
        line = proc.stdout.readline()
        out_lines.append(line)
        if "DRIVER_READY" in line:
            break
    else:
        proc.kill()
        raise AssertionError("driver never reached the job")
    # 32 one-second tasks over 8 cores = a >=4s python stage; a kill at
    # +2.5s lands mid-stage with tasks in flight on the victim
    time.sleep(2.5)
    os.killpg(workers[1].pid, signal.SIGKILL)
    try:
        out, err = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError("job did not finish after executor loss")
    assert proc.returncode == 0, f"driver failed after kill:\n{out[-2000:]}\n{err[-4000:]}"
    payload = [l for l in out.splitlines() if l.startswith("RESULT ")]
    assert payload, out[-2000:]
    rows = json.loads(payload[0][len("RESULT "):])["rows"]
    expect = sorted(
        [k, sum(i for i in range(20000) if i % 7 == k), sum(1 for i in range(20000) if i % 7 == k)]
        for k in range(7)
    )
    assert rows == expect
