"""IioSink unit tests against a fake `iio` module.

The reference's SDR backend is its only output path (pluto_tx_thread_ep,
plutogpssim.c:2058-2190); ours is an optional sink.  These tests inject a
recording fake of the libiio Python binding and assert the sink performs
the reference's exact PHY bring-up (c:2095-2141), LO power sequencing
(TX LO up only after the first buffer exists, c:2139-2141; down at
teardown, c:2162-2165), and buffer push sequence (c:2146-2158).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


class FakeAttr:
    def __init__(self, log, key):
        self._log = log
        self._key = key
        self._value = None

    @property
    def value(self):
        return self._value

    @value.setter
    def value(self, v):
        self._value = v
        self._log.append((self._key, v))


class FakeChannel:
    def __init__(self, log, dev, name):
        self._log = log
        self._key = f"{dev}:{name}"
        self.attrs = _AttrDict(log, self._key)
        self._enabled = False

    @property
    def enabled(self):
        return self._enabled

    @enabled.setter
    def enabled(self, v):
        self._enabled = v
        self._log.append((f"{self._key}.enabled", v))


class _AttrDict(dict):
    def __init__(self, log, key):
        super().__init__()
        self._log = log
        self._key = key

    def __missing__(self, name):
        a = FakeAttr(self._log, f"{self._key}.{name}")
        self[name] = a
        return a


class FakeDevice:
    def __init__(self, log, name):
        self._log = log
        self.name = name
        self._channels: dict[str, FakeChannel] = {}
        self.kernel_buffers = None

    def find_channel(self, name, is_output=False):
        if name not in self._channels:
            self._channels[name] = FakeChannel(self._log, self.name, name)
        return self._channels[name]

    def set_kernel_buffers_count(self, n):
        self.kernel_buffers = n
        self._log.append((f"{self.name}.kernel_buffers", n))


class FakeContext:
    def __init__(self, log, kind):
        self._log = log
        log.append(("context", kind))
        self._devices = {
            "ad9361-phy": FakeDevice(log, "ad9361-phy"),
            "cf-ad9361-dds-core-lpc": FakeDevice(log, "cf-ad9361-dds-core-lpc"),
        }

    def find_device(self, name):
        return self._devices.get(name)


class FakeBuffer:
    def __init__(self, log, device, samples, cyclic):
        self._log = log
        self.samples = samples
        self.data = b""
        log.append(("buffer_create", samples))

    def write(self, data):
        self.data = bytes(data)

    def push(self):
        self._log.append(("push", len(self.data)))


@pytest.fixture()
def fake_iio(monkeypatch):
    log: list = []
    mod = types.ModuleType("iio")
    mod.Context = lambda uri=None: FakeContext(log, uri or "default")
    mod.NetworkContext = lambda host: FakeContext(log, f"net:{host}")
    mod.Buffer = lambda dev, n, cyclic: FakeBuffer(log, dev, n, cyclic)
    monkeypatch.setitem(sys.modules, "iio", mod)
    return log


def _make_sink(**kw):
    from pluto_gps_sim_tpu.runtime.sinks import IioSink
    return IioSink(fs=2_600_000.0, bw_hz=3_000_000.0, gain_db=-20.0, **kw)


def test_phy_bringup_matches_reference(fake_iio):
    sink = _make_sink(uri="usb:1.2.3")
    dict_log = {k: v for k, v in fake_iio if k != "push"}
    # context from the given URI (c:2072-2081 fallback chain head)
    assert ("context", "usb:1.2.3") in fake_iio
    # 12 kernel buffers (c:2103)
    assert dict_log["cf-ad9361-dds-core-lpc.kernel_buffers"] == 12
    # PHY voltage0: port A, bw, fs, gain (c:2106-2111)
    assert dict_log["ad9361-phy:voltage0.rf_port_select"] == "A"
    assert dict_log["ad9361-phy:voltage0.rf_bandwidth"] == "3000000"
    assert dict_log["ad9361-phy:voltage0.sampling_frequency"] == "2600000"
    assert dict_log["ad9361-phy:voltage0.hardwaregain"] == "-20.0"
    # RX LO powered down, TX LO tuned to L1 (c:2112-2118)
    assert dict_log["ad9361-phy:altvoltage0.powerdown"] == "1"
    assert dict_log["ad9361-phy:altvoltage1.frequency"] == "1575420000"
    # I/Q channels enabled (c:2120-2129)
    assert dict_log["cf-ad9361-dds-core-lpc:voltage0.enabled"] is True
    assert dict_log["cf-ad9361-dds-core-lpc:voltage1.enabled"] is True
    # TX LO must NOT be powered up before streaming starts (c:2139)
    assert ("ad9361-phy:altvoltage1.powerdown", "0") not in fake_iio
    sink.close()


def test_network_context(fake_iio):
    sink = _make_sink(hostname="pluto.local")
    assert ("context", "net:pluto.local") in fake_iio
    sink.close()


def test_lo_power_sequencing_and_push(fake_iio):
    sink = _make_sink()
    block = np.zeros((2, 1000, 2), dtype=np.int16)
    sink.write(block)
    sink.write(block)
    keys = [k for k, _ in fake_iio]
    # TX LO powers up AFTER the first buffer is created (c:2139-2141)
    up = fake_iio.index(("ad9361-phy:altvoltage1.powerdown", "0"))
    assert fake_iio.index(("buffer_create", 2000)) < up < keys.index("push")
    # every write pushes the full block (c:2146-2158)
    assert keys.count("push") == 2
    assert ("push", block.nbytes) in fake_iio
    assert sink.bytes_written == 2 * block.nbytes
    sink.close()
    # TX LO powered down and I/Q disabled at teardown (c:2162-2175)
    assert fake_iio[-3:] == [
        ("ad9361-phy:altvoltage1.powerdown", "1"),
        ("cf-ad9361-dds-core-lpc:voltage0.enabled", False),
        ("cf-ad9361-dds-core-lpc:voltage1.enabled", False),
    ]
    assert sink.ctx is None


def test_buffer_recreated_on_block_size_change(fake_iio):
    sink = _make_sink()
    sink.write(np.zeros((1, 1000, 2), dtype=np.int16))
    sink.write(np.zeros((1, 500, 2), dtype=np.int16))
    creates = [v for k, v in fake_iio if k == "buffer_create"]
    assert creates == [1000, 500]
    # power-up happens exactly once, on the FIRST buffer
    ups = [1 for kv in fake_iio
           if kv == ("ad9361-phy:altvoltage1.powerdown", "0")]
    assert len(ups) == 1
    sink.close()


def test_missing_binding_is_clean_error(monkeypatch):
    monkeypatch.setitem(sys.modules, "iio", None)
    from pluto_gps_sim_tpu.runtime.sinks import IioSink
    with pytest.raises(RuntimeError, match="libiio"):
        IioSink(fs=2.6e6, bw_hz=3e6, gain_db=-20.0)


def test_open_sink_routes_to_iio(fake_iio):
    from pluto_gps_sim_tpu.runtime.sinks import IioSink, open_sink
    sink = open_sink("iio", fs=2.6e6, bw_hz=3e6, gain_db=-20.0,
                     uri="ip:192.168.2.1")
    assert isinstance(sink, IioSink)
    assert ("context", "ip:192.168.2.1") in fake_iio
    sink.close()
