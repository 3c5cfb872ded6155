"""Pushgateway client: real HTTP push against a loopback server, path and
exposition-payload pinning (PrometheusStats.java push parity)."""

import http.server
import threading


def test_push_roundtrip_loopback():
    from planetiler_ray.state.progress import PushGateway

    got = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_PUT(self):
            got["path"] = self.path
            got["ctype"] = self.headers["Content-Type"]
            got["body"] = self.rfile.read(
                int(self.headers["Content-Length"])).decode()
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        gw = PushGateway(f"http://127.0.0.1:{srv.server_port}",
                         job="flagship", grouping={"instance": "test-1"})
        status = gw.push(snapshot={"counts": {"tiles": 42,
                                              "stage:places": 7},
                                   "elapsed_s": 1.5},
                         extra_gauges={"mem_bytes": 123})
        assert status == 200
    finally:
        srv.shutdown()
    assert got["path"] == "/metrics/job/flagship/instance/test_1"
    assert "version=0.0.4" in got["ctype"]
    assert "planetiler_ray_tiles_total 42" in got["body"]
    assert 'planetiler_ray_stage_total{label="places"} 7' in got["body"]
    assert "planetiler_ray_mem_bytes 123" in got["body"]


def test_push_injected_transport():
    from planetiler_ray.state.progress import PushGateway

    calls = []

    def transport(method, path, body, headers):
        calls.append((method, path, body))
        return 202

    gw = PushGateway("http://gw:9091", job="j", transport=transport)
    assert gw.push(snapshot={"counts": {}, "elapsed_s": 0}) == 202
    method, path, body = calls[0]
    assert method == "PUT" and path == "/metrics/job/j"
    assert b"planetiler_ray_elapsed_seconds 0" in body
