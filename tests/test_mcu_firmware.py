"""Register-mock tests for the MCU firmware layer (serialbridge/mcu.cpp).

Validates the ported STM32 driver semantics at the register level:
TIM3 PWM configuration, per-wheel CCR duty, direction GPIO patterns,
USART ring behavior, the firmware main loop's frame parse + checksum +
watchdog, and equivalence with the protocol-level VehicleSim on
well-framed streams. Reference: car/motor.c, car/usart.c,
car/simple_car_controller_stm32.c.
"""

import numpy as np
import pytest

from fastscnn_tpu.serialbridge import VehicleSim, pack_packet
from fastscnn_tpu.serialbridge.mcu import DIRECTIONS, WHEELS, Mcu, RegisterVehicle

PIN_RF, PIN_LR, PIN_RR, PIN_LF, PIN_ST = 1 << 0, 1 << 1, 1 << 2, 1 << 3, 1 << 4


def test_pwm_init_register_contract():
    """TIM3 must be configured for 1 kHz PWM with unit duty 1/1000
    (reference:car/motor.c:63-65: ARR=999, PSC=71 at 72 MHz)."""
    m = Mcu()
    m.motor_pwm_init()
    assert m.tim3_arr == 999
    assert m.tim3_psc == 71
    assert m.tim3_enabled
    # default g_speed=500 loaded into every CCR (reference:car/motor.c:3,72)
    assert [m.tim3_ccr(c) for c in (1, 2, 3, 4)] == [500] * 4
    # clocks gated on: GPIOA/B on APB2, TIM3 on APB1
    assert m.rcc_apb2enr & (1 << 2) and m.rcc_apb2enr & (1 << 3)
    assert m.rcc_apb1enr & (1 << 1)


def test_set_speed_clamps_and_writes_all_channels():
    m = Mcu()
    m.motor_pwm_init()
    m.motor_set_speed(1700)
    assert [m.tim3_ccr(c) for c in (1, 2, 3, 4)] == [1000] * 4
    m.motor_set_speed(250)
    assert [m.tim3_ccr(c) for c in (1, 2, 3, 4)] == [250] * 4


def test_direction_gpio_patterns():
    """Forward = RF/LR set + RR/LF reset; back is the inverse
    (reference:car/motor.c:115-143)."""
    m = Mcu()
    m.motor_pwm_init()
    m.motor_set_direction("forward")
    odr = m.gpioa_odr
    assert odr & PIN_RF and odr & PIN_LR
    assert not (odr & PIN_RR) and not (odr & PIN_LF)
    m.motor_set_direction("back")
    odr = m.gpioa_odr
    assert not (odr & PIN_RF) and not (odr & PIN_LR)
    assert odr & PIN_RR and odr & PIN_LF


def test_turn_applies_quarter_speed_inner_wheels():
    """Motor_SetDirection turns: inner side 25% duty
    (reference:car/motor.c:146-183)."""
    m = Mcu()
    m.motor_pwm_init()
    m.motor_set_speed(800)
    m.motor_set_direction("left")  # right side 100%, left side 25%
    assert m.tim3_ccr(1) == 800 and m.tim3_ccr(3) == 800  # right front/rear
    assert m.tim3_ccr(2) == 200 and m.tim3_ccr(4) == 200  # left rear/front
    m.motor_set_direction("right")
    assert m.tim3_ccr(1) == 200 and m.tim3_ccr(3) == 200
    assert m.tim3_ccr(2) == 800 and m.tim3_ccr(4) == 800


def test_direction_with_speed_stops_inner_wheels():
    """Motor_SetDirectionWithSpeed computes inner duty as speed*0/10 = 0
    (the code, not its 20% comment — reference:car/motor.c:228,247)."""
    m = Mcu()
    m.motor_pwm_init()
    m.motor_set_direction_with_speed("left", 600)
    assert m.tim3_ccr(1) == 600 and m.tim3_ccr(3) == 600
    assert m.tim3_ccr(2) == 0 and m.tim3_ccr(4) == 0


def test_differential_speed_maps_sides_to_channels():
    """CCR1/3 = right duty, CCR2/4 = left duty per the motor.h wiring
    (reference:car/motor.c:306-324, car/motor.h:24-34)."""
    m = Mcu()
    m.motor_pwm_init()
    m.motor_set_differential(300, 900)
    assert m.tim3_ccr(1) == 900 and m.tim3_ccr(3) == 900
    assert m.tim3_ccr(2) == 300 and m.tim3_ccr(4) == 300
    # clamped
    m.motor_set_differential(5000, 5000)
    assert m.tim3_ccr(1) == 1000 and m.tim3_ccr(2) == 1000


def test_motor_enable_pin():
    m = Mcu()
    m.motor_enable(True)
    assert m.gpioa_odr & PIN_ST and m.motor_enabled
    m.motor_enable(False)
    assert not (m.gpioa_odr & PIN_ST) and not m.motor_enabled


def test_usart_ring_drops_ff_and_wraps():
    """IRQ handler skips 0xFF bytes and wraps the ring at its capacity
    (reference:car/usart.c:56-71; usart.h fixes REC_LEN=5)."""
    m = Mcu(rx_ring_len=5)
    m.usart_init(115200)
    m.usart_set_drop_ff(True)  # reference behavior (latent bug for int16 payloads)
    assert m.usart_brr == 115200
    for b in (0x01, 0xFF, 0x02, 0xFF, 0x03):
        m.usart_irq_rx(b)
    assert m.rx_len == 3  # both 0xFF dropped
    m.usart_irq_rx(0x04)
    m.usart_irq_rx(0x05)  # hits capacity 5 → wraps to 0
    assert m.rx_len == 0


def test_firmware_boot_banner_and_state():
    m = Mcu()
    m.boot()
    assert b"Simple Car Controller Ready" in m.read_tx()
    assert m.motor_enabled and m.tim3_enabled
    assert m.speeds == (0, 0)


def test_firmware_poll_applies_packet_to_registers():
    v = Mcu()
    v.boot()
    v.read_tx()
    applied = v.poll(pack_packet(400, -250), now_ms=1000)
    assert applied == 1
    assert v.speeds == (400, -250)
    # registers: CCR2/4 = |left| = 400, CCR1/3 = |right| = 250
    assert v.tim3_ccr(2) == 400 and v.tim3_ccr(4) == 400
    assert v.tim3_ccr(1) == 250 and v.tim3_ccr(3) == 250
    # direction bits: left forward (LR set, LF clear), right backward
    odr = v.gpioa_odr
    assert odr & PIN_LR and not (odr & PIN_LF)
    assert not (odr & PIN_RF) and odr & PIN_RR
    # signed wheel kinematics derived purely from registers
    wv = v.wheel_velocities
    assert wv["left_front"] == 400 and wv["left_rear"] == 400
    assert wv["right_front"] == -250 and wv["right_rear"] == -250
    assert b"Speed: L=400 R=-250" in v.read_tx()


def test_firmware_poll_rejects_bad_checksum():
    v = Mcu()
    v.boot()
    v.read_tx()
    pkt = bytearray(pack_packet(500, 500))
    pkt[5] ^= 0x5A  # corrupt checksum
    assert v.poll(bytes(pkt), now_ms=10) == 0
    assert v.checksum_errors == 1
    assert v.speeds == (0, 0)
    assert b"Checksum Error" in v.read_tx()


def test_firmware_poll_rejects_bad_framing():
    v = Mcu()
    v.boot()
    v.read_tx()
    pkt = bytearray(pack_packet(500, 500))
    pkt[6] = 0x00  # break tail
    assert v.poll(bytes(pkt), now_ms=10) == 0
    assert v.protocol_errors == 1
    assert b"Protocol Error" in v.read_tx()


def test_firmware_watchdog_stops_after_500ms():
    """>500 ms of command silence auto-stops the wheels
    (reference:car/simple_car_controller_stm32.c:74-81)."""
    v = Mcu()
    v.boot()
    v.poll(pack_packet(600, 600), now_ms=1000)
    assert v.speeds == (600, 600)
    v.poll(b"", now_ms=1400)  # within window
    assert v.speeds == (600, 600) and v.watchdog_stops == 0
    v.poll(b"", now_ms=1501)  # expired
    assert v.speeds == (0, 0) and v.watchdog_stops == 1
    assert all(v.tim3_ccr(c) == 0 for c in (1, 2, 3, 4))


def test_back_to_back_packets_one_poll():
    v = Mcu()
    v.boot()
    stream = pack_packet(100, 100) + pack_packet(-300, 200)
    assert v.poll(stream, now_ms=50) == 2
    assert v.speeds == (-300, 200)


def test_register_vehicle_matches_vehiclesim_on_framed_streams():
    """The register-level firmware and the protocol-level VehicleSim must
    agree on wheels/watchdog for well-framed streams (the VehicleSim seam
    contract). VehicleSim's resync parser additionally tolerates garbage
    between packets, which the fixed-offset firmware parse does not —
    so only framed streams are part of the shared contract."""
    rng = np.random.default_rng(0)
    reg = RegisterVehicle()
    sim = VehicleSim(timeout_ms=500)
    now = 0
    for _ in range(50):
        l, r = int(rng.integers(-1200, 1200)), int(rng.integers(-1200, 1200))
        now += int(rng.integers(1, 400))
        data = pack_packet(l, r)
        reg.feed(data, now)
        sim.feed(data, now)
        assert reg.wheels == sim.wheels
        # occasional silent gap to exercise the watchdog identically
        if rng.random() < 0.2:
            now += 600
            reg.tick(now)
            sim.tick(now)
            assert reg.wheels == sim.wheels == (0, 0)
    assert reg.watchdog_stops == sim.watchdog_stops


def test_register_vehicle_rejects_other_timeouts():
    with pytest.raises(ValueError):
        RegisterVehicle(timeout_ms=100)
