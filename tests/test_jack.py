"""JACK-graph adapter tests (csrc/beamio.cpp bio_jack_*, runtime.native
.JackClient): the literal rosjack client role — input_N/output ports,
physical-port auto-connect, RT-callback sample exchange
(rosjack.cpp:98-157,234-270).

Hermetic: no JACK server exists in this image, so a fake libjack
(csrc/fakejack.cpp) stands in via the BEAMIO_JACK_LIB dlopen override. The
fake implements the ABI subset beamio binds plus a driver API that invokes
the registered process callback by hand — the test IS the server's
real-time thread, with a deterministic clock. dlopen of the same path from
beamio and ctypes.CDLL here return ONE shared library instance, so the
driver sees the callback beamio registered.
"""

import ctypes
import os
import subprocess
import threading
import time

import numpy as np
import pytest

from beamform_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/native build unavailable")

CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")


@pytest.fixture(scope="module")
def fake_lib_path():
    so = os.path.join(CSRC, "libfakejack.so")
    src = os.path.join(CSRC, "fakejack.cpp")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", CSRC, "libfakejack.so"], check=True,
                       capture_output=True, timeout=120)
    return so


@pytest.fixture
def fake(fake_lib_path, monkeypatch):
    """BEAMIO_JACK_LIB -> fake server; yields the driver handle."""
    monkeypatch.setenv("BEAMIO_JACK_LIB", fake_lib_path)
    drv = ctypes.CDLL(fake_lib_path)
    c = ctypes
    drv.fakejack_drive.restype = c.c_int
    drv.fakejack_drive.argtypes = [c.POINTER(c.c_float), c.c_uint32,
                                   c.c_int, c.POINTER(c.c_float)]
    drv.fakejack_num_connections.restype = c.c_int
    drv.fakejack_connection.restype = c.c_int
    drv.fakejack_connection.argtypes = [c.c_int, c.c_char_p, c.c_int]
    drv.fakejack_is_open.restype = c.c_int
    return drv


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def drive(drv, block, out_frames=None):
    """One process cycle: (C, N) capture block in, (N,) playback out."""
    block = np.ascontiguousarray(block, dtype=np.float32)
    ch, n = block.shape
    inter = np.ascontiguousarray(block.T)
    out = np.zeros(out_frames or n, dtype=np.float32)
    rc = drv.fakejack_drive(_fp(inter), n, ch, _fp(out))
    assert rc == 0, "no process callback registered"
    return out


def test_runtime_available(fake):
    assert native.jack_available()


def test_capture_interleave_bit_exact(fake):
    cl = native.JackClient(channels=3)
    try:
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 256)).astype(np.float32)
        drive(fake, x)
        got = cl.read(256)
        np.testing.assert_array_equal(got, x)
        # frames accumulate across cycles; read smaller than one period
        y = rng.standard_normal((3, 256)).astype(np.float32)
        drive(fake, y)
        got = cl.read(100)
        np.testing.assert_array_equal(got, y[:, :100])
    finally:
        cl.close()


def test_playback_and_underrun_silence(fake):
    cl = native.JackClient(channels=1)
    try:
        mono = np.linspace(-0.5, 0.5, 256).astype(np.float32)
        assert cl.write(mono) == 256
        out = drive(fake, np.zeros((1, 256), np.float32))
        np.testing.assert_array_equal(out, mono)
        # nothing queued -> the callback plays silence (decoupling-lag
        # semantics, jack_write.cpp:7-10), never garbage
        out = drive(fake, np.zeros((1, 256), np.float32))
        np.testing.assert_array_equal(out, np.zeros(256, np.float32))
    finally:
        cl.close()


def test_autoconnect_physical_ports(fake):
    cl = native.JackClient(channels=3)
    try:
        assert cl.connected_in == 3       # rosjack.cpp:240-249
        assert cl.connected_out == 1      # rosjack.cpp:258-266
        assert fake.fakejack_num_connections() == 4
        buf = ctypes.create_string_buffer(128)
        fake.fakejack_connection(0, buf, len(buf))
        assert buf.value == b"system:capture_1 -> beamform_tpu:input_1"
        fake.fakejack_connection(3, buf, len(buf))
        assert buf.value == b"beamform_tpu:output -> system:playback_1"
    finally:
        cl.close()


def test_no_autoconnect(fake):
    cl = native.JackClient(channels=2, auto_connect=False,
                           connect_out=False)
    try:
        assert cl.connected_in == 0 and cl.connected_out == 0
        assert fake.fakejack_num_connections() == 0
    finally:
        cl.close()


def test_engine_rate_follows_server(fake):
    # rosjack.cpp:141-145: the engine runs at jack_get_sample_rate
    fake.fakejack_set_rate(44100)
    cl = native.JackClient(channels=1)
    try:
        assert cl.sample_rate == 44100
    finally:
        cl.close()
        fake.fakejack_set_rate(48000)


def test_capture_overrun_drops_and_counts(fake):
    cl = native.JackClient(channels=2)
    try:
        # cap ring holds 2 s * rate * ch floats; overfill without reading
        big = np.zeros((2, 48000), np.float32)
        for _ in range(3):
            drive(fake, big)
        assert cl.xruns >= 1              # "miss the deadline, lose the
    finally:                              # period" (rosjack.cpp:78-82)
        cl.close()


def test_server_shutdown_detected(fake):
    cl = native.JackClient(channels=1)
    try:
        assert cl.alive
        fake.fakejack_shutdown()
        assert not cl.alive
        with pytest.raises(RuntimeError, match="shut down|stalled"):
            cl.read(64)
    finally:
        cl.close()


def test_cli_jack_live_loop(fake, capsys):
    """End-to-end: `beamform-tpu das --jack` joins the (fake) graph, the
    graph's RT clock feeds it, and beamformed audio comes back out of the
    client's output port — the repo's equivalent of running the das node
    inside a live jackd session (launch/das.launch)."""
    from beamform_tpu.runtime.cli import build_parser, run_live

    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "beamform_tpu", "configs", "aira3.yaml")

    stop = threading.Event()
    outs = []

    def rt_thread():
        # the server clock: 256-frame periods of a 1 kHz tone; ctypes
        # releases the GIL during fakejack_drive, so this thread runs while
        # run_live blocks inside bio_jack_read
        t0 = 0
        while not stop.is_set():
            if fake.fakejack_is_open():
                t = (t0 + np.arange(256)) / 48000.0
                tone = 0.2 * np.sin(2 * np.pi * 1000 * t).astype(np.float32)
                block = np.broadcast_to(tone, (3, 256))
                inter = np.ascontiguousarray(block.T, dtype=np.float32)
                out = np.zeros(256, dtype=np.float32)
                if fake.fakejack_drive(_fp(inter), 256, 3, _fp(out)) == 0:
                    outs.append(out.copy())
                    t0 += 256
            time.sleep(0.001)

    th = threading.Thread(target=rt_thread, daemon=True)
    th.start()
    try:
        args = build_parser().parse_args(
            ["das", "--live", "--jack", "--array-config", cfg,
             "--window-size", "256", "--max-chunks", "3", "--theta", "20"])
        rc = run_live(args)
    finally:
        stop.set()
        th.join(timeout=5)
    assert rc == 0
    # the processed tone made it back out of the output port
    tail = np.concatenate(outs[-40:]) if outs else np.zeros(1)
    assert float(np.max(np.abs(tail))) > 1e-3
    report = capsys.readouterr().err
    assert "jack_xruns" in report
