"""In-process S3-compatible object store stub (MinIO stand-in).

The reference's disk mode boots a MinIO container and injects the S3
env into the engine (``/root/reference/helix-cli/src/local_runtime.rs:773-786``).
No container runtime exists in this image, so this stub speaks enough
of the S3 REST API for the ``s3://`` snapshot-store backend to run for
real: path-style PUT/GET with full server-side **SigV4 verification**
(the stub recomputes the signature from the received headers and the
known secret, so a broken client signer fails loudly instead of being
waved through).
"""

from __future__ import annotations

import hashlib
import hmac
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

_NO_SUCH_KEY = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b"<Error><Code>NoSuchKey</Code>"
    b"<Message>The specified key does not exist.</Message></Error>"
)
_DENIED = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b"<Error><Code>SignatureDoesNotMatch</Code></Error>"
)


class S3Stub:
    """``with S3Stub(access, secret) as stub: ... stub.endpoint ...``"""

    def __init__(self, access_key: str, secret_key: str,
                 region: str = "us-east-1"):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.blobs: dict[str, bytes] = {}  # "bucket/key" -> data
        self.requests: list[tuple[str, str]] = []  # (method, path)
        stub = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *args):
                pass

            def _verify(self, payload: bytes) -> bool:
                auth = self.headers.get("Authorization", "")
                amz_date = self.headers.get("x-amz-date", "")
                content_sha = self.headers.get("x-amz-content-sha256", "")
                if not auth.startswith("AWS4-HMAC-SHA256 "):
                    return False
                try:
                    fields = dict(
                        part.strip().split("=", 1)
                        for part in auth[len("AWS4-HMAC-SHA256 "):].split(",")
                    )
                    credential = fields["Credential"]
                    signed_headers = fields["SignedHeaders"]
                    got_sig = fields["Signature"]
                    access, datestamp, region, service, terminal = (
                        credential.split("/")
                    )
                except (KeyError, ValueError):
                    return False
                if access != stub.access_key or service != "s3":
                    return False
                if hashlib.sha256(payload).hexdigest() != content_sha:
                    return False
                host = self.headers.get("Host", "")
                canonical_headers = (
                    f"host:{host}\n"
                    f"x-amz-content-sha256:{content_sha}\n"
                    f"x-amz-date:{amz_date}\n"
                )
                canonical_request = "\n".join([
                    self.command, self.path.split("?")[0], "",
                    canonical_headers, signed_headers, content_sha,
                ])
                scope = f"{datestamp}/{region}/s3/aws4_request"
                string_to_sign = "\n".join([
                    "AWS4-HMAC-SHA256", amz_date, scope,
                    hashlib.sha256(canonical_request.encode()).hexdigest(),
                ])

                def step(key: bytes, msg: str) -> bytes:
                    return hmac.new(key, msg.encode(), hashlib.sha256).digest()

                k = step(("AWS4" + stub.secret_key).encode(), datestamp)
                k = step(k, region)
                k = step(k, "s3")
                k = step(k, "aws4_request")
                want_sig = hmac.new(
                    k, string_to_sign.encode(), hashlib.sha256
                ).hexdigest()
                return hmac.compare_digest(want_sig, got_sig)

            def _respond(self, status: int, body: bytes,
                         ctype: str = "application/xml") -> None:
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                length = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(length)
                stub.requests.append(("PUT", self.path))
                if not self._verify(payload):
                    return self._respond(403, _DENIED)
                stub.blobs[unquote(self.path).lstrip("/")] = payload
                self._respond(200, b"")

            def do_GET(self):
                stub.requests.append(("GET", self.path))
                if not self._verify(b""):
                    return self._respond(403, _DENIED)
                blob = stub.blobs.get(unquote(self.path).lstrip("/"))
                if blob is None:
                    return self._respond(404, _NO_SUCH_KEY)
                self._respond(200, blob, "application/octet-stream")

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint = f"http://127.0.0.1:{self._server.server_port}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def __enter__(self) -> "S3Stub":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    def env(self) -> dict[str, str]:
        """The env the reference injects into disk-mode engines
        (``local_runtime.rs:773-786``)."""
        return {
            "AWS_ENDPOINT": self.endpoint,
            "AWS_ACCESS_KEY_ID": self.access_key,
            "AWS_SECRET_ACCESS_KEY": self.secret_key,
            "S3_REGION": self.region,
        }
