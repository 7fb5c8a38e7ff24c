#!/usr/bin/env python3
"""Car-control API usage example (port of reference:car_control_example.py).

Shows both protocols driving figure patterns; run with a real serial
port, or leave --port unset to drive the in-process firmware simulator.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from fastscnn_tpu.serialbridge import SimpleCarController, VehicleSim, pack_packet


class SimTransport:
    """Loopback transport feeding the firmware-equivalent VehicleSim."""

    def __init__(self):
        self.vehicle = VehicleSim()
        self.t0 = time.time()

    def send_speeds(self, left, right):
        now_ms = int((time.time() - self.t0) * 1000)
        self.vehicle.feed(pack_packet(left, right), now_ms)
        print(f"  -> wheels now {self.vehicle.wheels}")


def demo_simple(car: SimpleCarController):
    print("forward 50%")
    car.forward(0.5)
    time.sleep(0.2)
    print("gentle S-curve via set_motion")
    for t in range(10):
        car.set_motion(0.4, 0.6 * math.sin(t / 3.0))
        time.sleep(0.1)
    print("spin left, then stop")
    car.spin_left(0.3)
    time.sleep(0.2)
    car.stop()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", default=None, help="serial device (default: simulator)")
    parser.add_argument("--baudrate", type=int, default=115200)
    args = parser.parse_args()

    if args.port:
        car = SimpleCarController(port=args.port, baudrate=args.baudrate)
        if not car.connect():
            raise SystemExit(f"cannot open {args.port}")
    else:
        print("no --port given: driving the firmware simulator")
        car = SimpleCarController(transport=SimTransport())

    try:
        demo_simple(car)
    finally:
        car.stop()
        car.disconnect()


if __name__ == "__main__":
    main()
