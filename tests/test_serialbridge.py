"""Native serial bridge: packet parity vs the reference struct packing,
firmware-sim watchdog behavior, and a pty end-to-end loop."""

import os
import pty
import struct

import pytest

from fastscnn_tpu.serialbridge import (
    Parser,
    SerialPort,
    SimpleCarController,
    VehicleSim,
    pack_packet,
    unpack_packet,
)


def _reference_pack(left, right):
    """The exact packing the reference host does
    (reference:kuruma/car_controller_simple.py:306-314)."""
    packet = struct.pack("<B", 0xAA)
    packet += struct.pack("<hh", left, right)
    checksum = sum(packet[1:]) & 0xFF
    packet += struct.pack("<B", checksum)
    packet += struct.pack("<B", 0x55)
    return packet


@pytest.mark.parametrize("l,r", [(0, 0), (300, -300), (-1000, 1000), (123, 456), (-7, 7)])
def test_pack_matches_reference(l, r):
    assert pack_packet(l, r) == _reference_pack(l, r)
    assert unpack_packet(pack_packet(l, r)) == (l, r)


def test_pack_clamps():
    assert unpack_packet(pack_packet(5000, -5000)) == (1000, -1000)


def test_unpack_rejects_corruption():
    pkt = bytearray(pack_packet(100, 200))
    pkt[5] ^= 0xFF  # break checksum
    assert unpack_packet(bytes(pkt)) is None
    pkt = bytearray(pack_packet(100, 200))
    pkt[0] = 0x00  # break header
    assert unpack_packet(bytes(pkt)) is None


def test_parser_handles_fragmentation_and_garbage():
    p = Parser()
    stream = b"\x01\x02" + pack_packet(10, -20) + b"\xff" + pack_packet(30, 40)
    # feed one byte at a time
    total = 0
    for i in range(len(stream)):
        total += p.feed(stream[i : i + 1])
    assert total == 2
    assert p.last == (30, 40)
    assert p.stats["packets"] == 2


def test_parser_counts_checksum_errors():
    p = Parser()
    bad = bytearray(pack_packet(10, 10))
    bad[5] ^= 0x01
    p.feed(bytes(bad))
    assert p.stats["checksum_errors"] == 1
    assert p.stats["packets"] == 0


def test_vehicle_sim_watchdog():
    v = VehicleSim(timeout_ms=500)
    v.feed(pack_packet(300, 300), now_ms=1000)
    assert v.wheels == (300, 300)
    # within timeout: keeps driving
    assert not v.tick(now_ms=1400)
    assert v.wheels == (300, 300)
    # past 500 ms without a command: auto-stop
    assert v.tick(now_ms=1501)
    assert v.wheels == (0, 0)
    assert v.watchdog_stops == 1
    # fresh command restarts
    v.feed(pack_packet(-100, 100), now_ms=2000)
    assert v.wheels == (-100, 100)


def test_vehicle_sim_clamps_and_rejects():
    v = VehicleSim()
    raw = struct.pack("<Bhh", 0xAA, 2000, -2000)
    raw += struct.pack("<B", sum(raw[1:]) & 0xFF) + b"\x55"
    v.feed(raw, now_ms=0)
    assert v.wheels == (1000, -1000)  # firmware clamp
    bad = bytearray(pack_packet(5, 5))
    bad[5] ^= 0x01
    v.feed(bytes(bad), now_ms=1)
    assert v.checksum_errors == 1
    assert v.wheels == (1000, -1000)  # unchanged


def test_controller_over_pty_to_vehicle_sim():
    """Full loop: SimpleCarController → pty 'UART' → firmware VehicleSim."""
    master_fd, slave_fd = pty.openpty()
    port = SerialPort(os.ttyname(slave_fd), 115200)
    try:
        car = SimpleCarController(transport=port)
        vehicle = VehicleSim()
        now = [0]

        def pump():
            data = os.read(master_fd, 256)
            now[0] += 10
            vehicle.feed(data, now_ms=now[0])

        assert car.forward(0.5)
        pump()
        assert vehicle.wheels == (500, 500)

        assert car.turn_left(0.4, 0.5)
        pump()
        assert vehicle.wheels == (200, 400)

        assert car.spin_right(0.3)
        pump()
        assert vehicle.wheels == (300, -300)

        assert car.stop()
        pump()
        assert vehicle.wheels == (0, 0)

        # duplicate suppression: same speeds → nothing sent
        assert car.stop()
        import select

        r, _, _ = select.select([master_fd], [], [], 0.05)
        assert not r
    finally:
        port.close()
        os.close(master_fd)
        os.close(slave_fd)


def test_set_motion_steering_math():
    sent = []

    class FakeTransport:
        def send_speeds(self, l, r):
            sent.append((l, r))

    car = SimpleCarController(transport=FakeTransport())
    car.set_motion(0.5, 0.5)  # base 500, diff 200 -> L=300 R=700
    assert sent[-1] == (300, 700)
    car.set_motion(0.5, -1.0)  # diff -400 -> L=900 R=100
    assert sent[-1] == (900, 100)
    car.set_motion(1.0, 0.0)
    assert sent[-1] == (1000, 1000)


def test_context_manager_stops_on_exit():
    sent = []

    class FakeTransport:
        def send_speeds(self, l, r):
            sent.append((l, r))

        def close(self):
            sent.append("closed")

    with SimpleCarController(transport=FakeTransport()) as car:
        car.forward(0.8)
    assert (800, 800) in sent
    assert (0, 0) in sent
    assert sent[-1] == "closed"


def test_constant_speed_keepalive_beats_watchdog():
    """A constant speed must be periodically re-sent: full suppression of
    identical commands starves the firmware's 500 ms watchdog and stops
    the car on every straight."""
    import time as _time

    from fastscnn_tpu.serialbridge import SimpleCarController

    class CountingTransport:
        def __init__(self):
            self.writes = []

        def write(self, data):
            self.writes.append(data)

    t = CountingTransport()
    ctrl = SimpleCarController(transport=t)
    ctrl.command_timeout = 0.2  # scaled-down watchdog for the test
    ctrl.set_wheel_speeds(300, 300)
    assert len(t.writes) == 1
    ctrl.set_wheel_speeds(300, 300)  # immediately: suppressed
    assert len(t.writes) == 1
    _time.sleep(0.15)  # > timeout/2
    ctrl.set_wheel_speeds(300, 300)  # keepalive must re-send
    assert len(t.writes) == 2
