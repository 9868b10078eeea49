"""HTTP serving shell for the helix-tpu engine."""

from .http_server import HelixHTTPServer, serve  # noqa: F401
