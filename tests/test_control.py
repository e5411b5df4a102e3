"""Runtime control surface for tail mode — the file-based analog of the
reference's HTTP control plane (server.go:59-158: getConfig /
setStrategyMode -> Reload) and metrics scrape (monitor.go:44-108)."""

import os

import pytest

from data_sync_ray import (
    ReplayJob,
    StreamSpec,
    SyncConfig,
    gen_base_table,
    gen_change_stream,
    replay_oracle,
    write_event_log,
)
from data_sync_ray.control import ControlPlane

from test_replay_e2e import assert_tables_equal, build_fixture


def _fixture(tmp_path):
    spec = StreamSpec(n_events=800, n_docs=80, n_epochs=2, seed=11)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec, n_base=80,
                                          seed=11)
    cfg = SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                     num_partitions=4)
    return ReplayJob(cfg), base, epochs, ev_root


@pytest.mark.usefixtures("ray_session")
def test_tail_writes_status_and_hot_applies_overrides(tmp_path):
    job, base, epochs, ev_root = _fixture(tmp_path)
    cp = ControlPlane(job.cfg.lake_root)
    # queue a mutable override + an immutable one (must be rejected)
    cp.set_strategy_mode(
        "run", config={"batch_size": 1024, "num_partitions": 64}
    )
    totals = job.tail(ev_root, poll_interval=0.01, max_rounds=2,
                      bootstrap=base)
    assert totals["rounds"] == 2
    assert job.cfg.batch_size == 1024          # Reload analog applied
    assert job.cfg.num_partitions == 4         # identity field untouched
    st = cp.get_status()
    assert st["strategy_mode"] == "run"
    assert st["config"]["batch_size"] == 1024  # getConfig analog
    assert st["applied_overrides"] == ["batch_size"]
    assert st["rejected_overrides"] == ["num_partitions"]
    assert st["events_applied"] > 0
    assert st["watermark_max"] >= 0
    assert st["failures"] == 0
    # streaming windowed throughput gauges: events were applied in round
    # 1, so both the window and last-round rates must be positive
    assert st["rate_window_events_per_sec"] > 0
    assert st["rate_last_round_events_per_sec"] >= 0
    assert_tables_equal(job.lake.read_all(), replay_oracle(base, epochs))


@pytest.mark.usefixtures("ray_session")
def test_tail_pause_and_stop_modes(tmp_path):
    job, base, epochs, ev_root = _fixture(tmp_path)
    cp = ControlPlane(job.cfg.lake_root)
    cp.set_strategy_mode("pause")
    totals = job.tail(ev_root, poll_interval=0.01, max_rounds=2)
    assert totals["rounds"] == 0               # paused: no replay rounds
    assert cp.get_status()["strategy_mode"] == "pause"
    cp.set_strategy_mode("stop")
    totals = job.tail(ev_root, poll_interval=0.01, max_rounds=5)
    assert totals["strategy_mode"] == "stop"
    assert totals["rounds"] == 0               # exited before any round
    cp.set_strategy_mode("run")
    job.tail(ev_root, poll_interval=0.01, max_rounds=1, bootstrap=base)
    assert_tables_equal(job.lake.read_all(), replay_oracle(base, epochs))


@pytest.mark.usefixtures("ray_session")
def test_http_control_server_roundtrip(tmp_path):
    """GET /status + /sync/getConfig + /sync/monitor/metrics and POST
    /sync/setStrategyMode — the server.go:59-158 analog served for real
    over a port, state backed by the same control/status files."""
    import json as _json
    import urllib.request

    job, base, epochs, ev_root = _fixture(tmp_path)
    # run one tail round with the server up so status.json exists
    totals = job.tail(ev_root, poll_interval=0.01, max_rounds=1,
                      bootstrap=base, http_port=0)
    port = totals["http_port"]
    assert port > 0

    from data_sync_ray.control import ControlServer

    srv = ControlServer(job.cfg.lake_root)
    port = srv.start()
    try:
        base_url = f"http://127.0.0.1:{port}"
        st = _json.load(urllib.request.urlopen(f"{base_url}/status"))
        assert st["events_applied"] > 0
        cfg = _json.load(
            urllib.request.urlopen(f"{base_url}/sync/getConfig")
        )
        assert cfg["num_partitions"] == 4
        metrics = urllib.request.urlopen(
            f"{base_url}/sync/monitor/metrics"
        ).read().decode()
        assert "data_sync_events_applied_total" in metrics

        # POST: queue a pause + one valid and one immutable override
        req = urllib.request.Request(
            f"{base_url}/sync/setStrategyMode",
            data=_json.dumps({
                "strategy_mode": "pause",
                "config": {"batch_size": 2048, "num_partitions": 64},
            }).encode(),
            method="POST",
        )
        resp = _json.load(urllib.request.urlopen(req))
        assert resp["queued"] is True
        assert resp["will_apply"] == ["batch_size"]
        assert resp["will_reject"] == ["num_partitions"]
        # the queued control is visible to the tail loop's reader
        cp = ControlPlane(job.cfg.lake_root)
        ctl = cp.read_control()
        assert ctl["strategy_mode"] == "pause"
        assert ctl["config"]["batch_size"] == 2048

        # a bad mode must 400, never land in control.json
        bad = urllib.request.Request(
            f"{base_url}/sync/setStrategyMode",
            data=b'{"strategy_mode": "bogus"}', method="POST",
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert cp.read_control()["strategy_mode"] == "pause"

        # unknown path -> 404
        try:
            urllib.request.urlopen(f"{base_url}/nope")
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()

    # the paused mode queued over HTTP governs the next tail run
    totals = job.tail(ev_root, poll_interval=0.01, max_rounds=2)
    assert totals["rounds"] == 0


def test_invalid_mode_rejected(tmp_path):
    cp = ControlPlane(str(tmp_path / "lake"))
    with pytest.raises(ValueError):
        cp.set_strategy_mode("bogus")


def test_prometheus_text_export():
    from data_sync_ray.control import status_to_prometheus

    text = status_to_prometheus(
        {"events_applied": 42, "strategy_mode": "pause", "failures": 1,
         "rate_window_events_per_sec": 123.4}
    )
    assert "data_sync_events_applied_total 42" in text
    assert "data_sync_failures_total 1" in text
    assert "data_sync_paused 1" in text
    assert "data_sync_rate_window_events_per_sec 123.4" in text
    assert text.endswith("\n")


def test_http_post_short_body_times_out_not_hangs(tmp_path):
    """A client over-reporting Content-Length must get a bounded-time
    400 (socket rw timeout), never pin the handler thread forever
    (ADVICE r3: control.py do_POST trusted Content-Length)."""
    import socket
    import time as _time

    from data_sync_ray.control import ControlServer

    srv = ControlServer(str(tmp_path / "lake"), rw_timeout=0.5)
    port = srv.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(
            b"POST /sync/setStrategyMode HTTP/1.1\r\n"
            b"Host: x\r\nContent-Length: 100\r\n\r\n"
            b"{"  # 1 byte of a promised 100
        )
        t0 = _time.monotonic()
        s.settimeout(5)
        data = s.recv(4096)  # must arrive once the 0.5s rw timeout fires
        dt = _time.monotonic() - t0
        assert b"400" in data.split(b"\r\n", 1)[0]
        assert dt < 4.0
        s.close()
    finally:
        srv.stop()


def test_sigterm_drains_tail_gracefully(tmp_path):
    """The gracehttp analog (ref src/lib/gracehttp/http.go:193-248):
    SIGTERM mid-tail finishes the in-flight round, publishes a final
    status with strategy_mode 'drained', and exits 0 — the lake is left
    exactly as a clean run would. Runs in a SUBPROCESS so the signal
    handler install (main-thread only) and process exit are real."""
    import json
    import signal
    import subprocess
    import sys
    import time

    spec = StreamSpec(n_events=1200, n_docs=100, n_epochs=3, seed=21)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec, n_base=100,
                                          seed=21)
    lake_root = os.path.join(str(tmp_path), "lake")
    script = os.path.join(str(tmp_path), "drive_tail.py")
    with open(script, "w") as f:
        f.write(f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from data_sync_ray import ReplayJob, SyncConfig, gen_base_table
job = ReplayJob(SyncConfig(lake_root={repr(lake_root)}, num_partitions=4))
base = gen_base_table(100, seed=21)
# max_rounds=None: only the drain (or a kill) ends this loop
job.tail({repr(ev_root)}, poll_interval=0.2, max_rounds=None,
         bootstrap=base)
ray.shutdown()
""")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    proc = subprocess.Popen([sys.executable, script], env=env)
    status_path = os.path.join(lake_root, "control", "status.json")
    try:
        deadline = time.time() + 120
        # wait until the first round has committed (status.json appears)
        while time.time() < deadline:
            if os.path.exists(status_path):
                try:
                    if json.load(open(status_path))["epochs_run"] >= 4:
                        break
                except (json.JSONDecodeError, KeyError):
                    pass
            if proc.poll() is not None:
                raise AssertionError("tail exited before SIGTERM")
            time.sleep(0.1)
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=120) == 0, "drain must exit 0"
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    st = json.load(open(status_path))
    assert st["strategy_mode"] == "drained"
    # the drained lake equals the sequential oracle exactly
    lake = __import__(
        "data_sync_ray.state.lake", fromlist=["Lake"]
    ).Lake(lake_root)
    assert_tables_equal(lake.read_all(), replay_oracle(base, epochs))
