"""Rich framed serial protocol: framing parity with the reference packing
and closed-loop controller ↔ device-sim tests."""

import struct

from fastscnn_tpu.serialbridge.rich_protocol import (
    CMD_EMERGENCY_STOP,
    CMD_SET_MOTION,
    CarController,
    RichVehicleSim,
    frame_command,
    parse_frames,
)


def _reference_frame(cmd_type, data):
    """reference:car_controller.py:334-341."""
    packet = struct.pack("<BB", 0xAA, cmd_type)
    packet += struct.pack("<B", len(data))
    packet += bytes(data)
    checksum = sum(packet[1:]) & 0xFF
    packet += struct.pack("<B", checksum)
    packet += struct.pack("<B", 0x55)
    return packet


def test_frame_matches_reference():
    for cmd, data in [
        (CMD_SET_MOTION, struct.pack("<HHH", 500, 400, 600)),
        (CMD_EMERGENCY_STOP, b""),
        (0x01, struct.pack("<H", 1000)),
    ]:
        assert frame_command(cmd, data) == _reference_frame(cmd, data)


def test_parse_frames_resync():
    buf = bytearray(b"\x00\x01" + frame_command(0x01, b"\x10\x00") + b"\xaa\xff")
    frames = parse_frames(buf)
    assert frames == [(0x01, b"\x10\x00")]


class FakeTransport:
    def __init__(self, sim):
        self.sim = sim

    def write(self, data):
        self.sim.feed(data)

    def read(self, maxlen=16, timeout_ms=100):
        out = bytes(self.sim.responses[:maxlen])
        del self.sim.responses[: len(out)]
        return out


def test_controller_motion_roundtrip():
    sim = RichVehicleSim()
    car = CarController(transport=FakeTransport(sim))
    # init sent an emergency stop
    assert sim.stopped and sim.wheels == [0, 0, 0, 0]

    car.set_motion(0.5, 0.0)
    assert sim.wheels == [500, 500, 500, 500]

    car.set_motion(0.5, 1.0)  # ratios 0.5 / 1.0 (clamped)
    assert sim.wheels == [250, 250, 500, 500]

    car.set_motion(0.5, -1.0)
    assert sim.wheels == [500, 500, 250, 250]

    status = car.get_status()
    assert status["left_front_speed"] == 500
    assert status["right_front_speed"] == 250
    assert status["current_steering"] == -1.0

    car.stop()
    assert sim.stopped


def test_steering_ratio_clamping():
    sim = RichVehicleSim()
    car = CarController(transport=FakeTransport(sim))
    car.set_speed(1.0)
    assert sim.wheels == [1000] * 4
    car.set_steering(1.0)  # left ratio 0.5, right 1.0 -> clamped within [0.3,1]
    assert sim.wheels == [500, 500, 1000, 1000]


def test_context_manager():
    sim = RichVehicleSim()
    with CarController(transport=FakeTransport(sim)) as car:
        car.set_speed(0.7)
        assert sim.wheels == [700] * 4
    assert sim.stopped


def test_parse_frames_resyncs_past_noise_header():
    """A noise byte matching the header followed by a garbage length must
    not stall valid frames already in the buffer."""
    from fastscnn_tpu.serialbridge.rich_protocol import PROTOCOL_HEADER

    good = frame_command(0x01, bytes([5, 6]))
    buf = bytearray(bytes([PROTOCOL_HEADER, 0x01, 0xF0]) + good)
    frames = parse_frames(buf)
    assert frames and frames[0][0] == 0x01 and list(frames[0][1]) == [5, 6]
