"""Heartbeat monitor tests with a fake clock."""

from compute_engine_tpu.runtime.health import HeartbeatMonitor


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_loss_and_recovery():
    clock = FakeClock()
    lost, recovered = [], []
    mon = HeartbeatMonitor(["host0", "host1"], timeout_s=5.0,
                           on_loss=lost.append, on_recovery=recovered.append,
                           poll_interval_s=3600, clock=clock)
    try:
        assert sorted(mon.alive_hosts()) == ["host0", "host1"]
        clock.t = 4.0
        mon.heartbeat("host1")
        clock.t = 6.0  # host0 last seen at 0 -> lost; host1 at 4 -> alive
        mon.check_now()
        assert lost == ["host0"]
        assert mon.alive_hosts() == ["host1"]

        mon.heartbeat("host0")
        mon.check_now()
        assert recovered == ["host0"]
        assert sorted(mon.alive_hosts()) == ["host0", "host1"]
    finally:
        mon.close()


def test_unknown_host_rejected():
    clock = FakeClock()
    mon = HeartbeatMonitor(["a"], poll_interval_s=3600, clock=clock)
    try:
        try:
            mon.heartbeat("nope")
            assert False, "expected KeyError"
        except KeyError:
            pass
    finally:
        mon.close()
