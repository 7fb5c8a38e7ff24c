"""Manual control (teleop + web car server) tests over fake transports."""

import json
import urllib.request

from fastscnn_tpu.serialbridge import SimpleCarController
from fastscnn_tpu.tools.manual_control import WebCarServer, teleop_step


class FakeTransport:
    def __init__(self):
        self.sent = []

    def send_speeds(self, l, r):
        self.sent.append((l, r))


def test_teleop_keys():
    t = FakeTransport()
    car = SimpleCarController(transport=t)
    assert teleop_step(car, "w")
    assert t.sent[-1] == (500, 500)
    assert teleop_step(car, "s")
    assert t.sent[-1] == (-500, -500)
    assert teleop_step(car, "a")  # turn_left(0.4, 0.6): inner=160, outer=400
    assert t.sent[-1] == (160, 400)
    assert teleop_step(car, " ")
    assert t.sent[-1] == (0, 0)
    assert teleop_step(car, "?")  # unknown key ignored
    assert not teleop_step(car, "z")  # quit stops


def test_web_car_server():
    t = FakeTransport()
    car = SimpleCarController(transport=t)
    server = WebCarServer(car, host="127.0.0.1", port=0)
    port = server.start()
    try:
        base = f"http://127.0.0.1:{port}"

        def post(path, payload):
            req = urllib.request.Request(
                f"{base}{path}", data=json.dumps(payload).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req, timeout=5).read())

        r = post("/api/forward", {"speed": 0.3})
        assert r == {"ok": True, "left": 300, "right": 300}
        r = post("/api/wheels", {"left": 150, "right": -150})
        assert r["left"] == 150 and r["right"] == -150
        r = post("/api/stop", {})
        assert r["left"] == 0 and r["right"] == 0
        state = json.loads(urllib.request.urlopen(f"{base}/api/state", timeout=5).read())
        assert state["left_wheel_speed"] == 0
        html = urllib.request.urlopen(f"{base}/", timeout=5).read().decode()
        assert "car control" in html
    finally:
        server.stop()
