"""Graph-store uploader interface — the engine analogue of the reference's
Stardog connectors (``StartdogGraphUploader`` basic-auth,
kg_text_to_ttl/text_to_turtle_processor.py:330-432, and the Azure-OAuth2
variant with 401/407 token-refresh retry ×3, :436-577).

The core pipeline is network-free, so the shipped implementation is a
local-directory store that honors the same verb semantics (PUT replaces a
named graph, POST appends) and the same retry wrapper shape; an HTTP
implementation plugs in by overriding ``_send`` only.
"""

from __future__ import annotations

import os

__all__ = ["GraphUploader", "LocalDirUploader", "UploadError"]


class UploadError(Exception):
    pass


class GraphUploader:
    """Upload Turtle content to a graph store.

    :param max_retries: re-attempts after a retryable failure (reference
        retries 3× on 401/407 after token refresh, :466,:523-555).
    """

    def __init__(self, max_retries: int = 3) -> None:
        self._max_retries = max_retries

    def upload(self, ttl_text: str, to_db: str, graph_ns: str, verb: str = "PUT") -> str:
        if verb not in ("PUT", "POST"):
            raise UploadError(f"Unsupported verb {verb}")
        last: Exception | None = None
        for _ in range(self._max_retries + 1):
            try:
                return self._send(ttl_text, to_db, graph_ns, verb)
            except UploadError:
                raise
            except Exception as ex:  # retryable transport error
                last = ex
                self._refresh_credentials()
        raise UploadError(f"Upload failed after {self._max_retries} retries: {last}")

    def _send(self, ttl_text: str, to_db: str, graph_ns: str, verb: str) -> str:
        raise NotImplementedError(
            "Network graph stores are out of scope in this environment; "
            "subclass GraphUploader and implement _send (HTTP PUT/POST with "
            "Content-Type: text/turtle), or use LocalDirUploader."
        )

    def _refresh_credentials(self) -> None:  # hook for OAuth2-style refresh
        pass


class LocalDirUploader(GraphUploader):
    """Stores graphs as ``<base>/<db>/<graph-slug>.ttl``; PUT replaces,
    POST appends."""

    def __init__(self, base_dir: str, max_retries: int = 3) -> None:
        super().__init__(max_retries)
        self._base = base_dir

    def _send(self, ttl_text: str, to_db: str, graph_ns: str, verb: str) -> str:
        slug = "".join(c if c.isalnum() or c in "-_." else "_" for c in graph_ns)
        db_dir = os.path.join(self._base, to_db)
        os.makedirs(db_dir, exist_ok=True)
        path = os.path.join(db_dir, f"{slug}.ttl")
        mode = "w" if verb == "PUT" else "a"
        with open(path, mode, encoding="utf8") as fh:
            fh.write(ttl_text)
        return path
