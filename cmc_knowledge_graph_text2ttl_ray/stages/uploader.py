"""Graph-store uploader interface — the engine analogue of the reference's
Stardog connectors (``StartdogGraphUploader`` basic-auth,
kg_text_to_ttl/text_to_turtle_processor.py:330-432, and the Azure-OAuth2
variant with 401/407 token-refresh retry ×3, :436-577).

Four concrete uploaders ship:

- :class:`LocalDirUploader` — filesystem store with the same verb semantics
  (PUT replaces a named graph, POST appends); the default for the
  network-free core pipeline.
- :class:`HttpGraphUploader` — stdlib-urllib basic-auth HTTP uploader with
  full reference URL semantics (``<stardog>`` env prefix, in-URL
  ``user:$VAR@`` credentials, graph/verb defaults).
- :class:`OAuth2GraphUploader` — client-credentials bearer-token variant
  with 401/407 token-refresh retry.
- :class:`DeviceCodeGraphUploader` — RFC 8628 device-authorization-grant
  variant: the headless equivalent of the reference runner's MSAL
  interactive login (text_to_turtle_runner.py:434-477), with silent
  token-cache reuse and refresh-token renewal.
"""

from __future__ import annotations

import os
import re

__all__ = [
    "GraphUploader",
    "LocalDirUploader",
    "HttpGraphUploader",
    "OAuth2GraphUploader",
    "DeviceCodeGraphUploader",
    "UploadError",
    "resolve_db_url",
]

_USER_INFO = re.compile(r"(https?)://([^:@]+)(:([^@]+))?@(.+)")


def resolve_db_url(
    to_db: str,
    server_url_var: str = "STARDOG_SERVER",
    password_var: str = "STARDOG_PASSWORD",
    username: str | None = None,
    password: str | None = None,
) -> tuple[str, str | None, str | None]:
    """Reference URL-resolution semantics (StartdogGraphUploader.upload,
    text_to_turtle_processor.py:361-398): ``<stardog>`` prefix → env base
    URL, ``user[:pass]@`` credentials in the URL (a ``$VAR`` password reads
    the environment), fallback password from ``password_var``.

    Returns (clean_url, username, password)."""
    if to_db.startswith("<stardog>"):
        base = os.environ.get(server_url_var)
        if not base:
            raise UploadError(
                f"Stardog server URL environment variable {server_url_var} "
                f"is not defined or empty"
            )
        to_db = base + to_db[9:]
    if not isinstance(to_db, str) or len(to_db) < 5:
        raise UploadError(f"Invalid graph DB URL: {to_db!r}")
    m = _USER_INFO.match(to_db)
    if m:
        username = m.group(2)
        pw = m.group(4)
        if pw is not None and pw.startswith("$"):
            pw = os.environ.get(pw[1:])
            if pw is None:
                raise UploadError(
                    f"Password environment variable {m.group(4)[1:]} not defined"
                )
        if pw is not None:
            password = pw
        to_db = f"{m.group(1)}://{m.group(5)}"
    if password is None:
        password = os.environ.get(password_var)
    return to_db, username, password


def _build_url(to_db: str, graph_ns: str | None, verb: str | None) -> tuple[str, str]:
    """Reference URL/verb defaults (:404-410): named graph → ``?graph=urn:doc:…``
    + PUT; whole-DB → POST."""
    url = to_db
    if graph_ns is not None:
        url += f"?graph=urn:doc:{graph_ns}"
        if verb is None:
            verb = "PUT"
    if verb is None:
        verb = "POST"
    return url, verb


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


class HttpGraphUploader(GraphUploader):
    """Basic-auth HTTP graph-store uploader (stdlib urllib — the engine has
    no third-party HTTP dependency). Mirrors the reference's
    ``StartdogGraphUploader`` (text_to_turtle_processor.py:330-432):
    ``<stardog>`` env-prefix, in-URL credentials with ``$VAR`` passwords,
    ``?graph=urn:doc:<ns>`` + PUT-for-graph / POST-for-db defaults,
    200/201 success, everything else raises."""

    def __init__(
        self,
        username: str | None = None,
        password: str | None = None,
        stardog_url_var: str = "STARDOG_SERVER",
        password_var: str = "STARDOG_PASSWORD",
        timeout: float = 30.0,
        max_retries: int = 0,
    ) -> None:
        super().__init__(max_retries)
        self._username = username
        self._password = password
        self._server_url_var = stardog_url_var
        self._password_var = password_var
        self._timeout = timeout

    def upload(self, ttl_text: str, to_db: str, graph_ns: str | None = None,
               verb: str | None = None) -> str:
        url, user, pw = resolve_db_url(
            to_db, self._server_url_var, self._password_var,
            self._username, self._password,
        )
        post_url, verb = _build_url(url, graph_ns, verb)
        headers = {"Content-Type": "text/turtle"}
        if user is not None:
            import base64

            cred = base64.b64encode(f"{user}:{pw or ''}".encode()).decode()
            headers["Authorization"] = f"Basic {cred}"
        data = ttl_text.encode("utf-8")
        last: Exception | None = None
        for _ in range(self._max_retries + 1):
            try:
                status, body = self._request(verb, post_url, data, headers)
            except UploadError as ex:  # transient transport error → retry
                last = ex
                continue
            if status not in (200, 201):
                raise UploadError(f"Upload request failed [{status}]: {body[:500]}")
            return post_url
        raise UploadError(
            f"Upload failed after {self._max_retries} transport retries: {last}"
        )

    def _request(self, verb: str, url: str, data: bytes,
                 headers: dict[str, str]) -> tuple[int, str]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, data=data, headers=headers, method=verb)
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as ex:
            return ex.code, ex.read().decode("utf-8", "replace")
        except urllib.error.URLError as ex:
            raise UploadError(f"Calling the graph-store API failed: {ex}") from ex


class OAuth2GraphUploader(HttpGraphUploader):
    """Client-credentials OAuth2 variant (reference
    ``AzureStartdogGraphUploader``, text_to_turtle_processor.py:436-577):
    bearer token fetched from ``token_endpoint``; a 401/407 response resets
    the token and retries up to ``max_retries`` times."""

    def __init__(
        self,
        *,
        client_id: str,
        client_secret: str,
        scope: str,
        token_endpoint: str,
        access_token: str | None = None,
        stardog_url_var: str = "STARDOG_SERVER",
        password_var: str = "STARDOG_PASSWORD",
        timeout: float = 30.0,
        max_retries: int = 3,
    ) -> None:
        super().__init__(None, None, stardog_url_var, password_var, timeout,
                         max_retries)
        self._client_id = client_id
        self._client_secret = client_secret
        self._scope = scope
        self._token_endpoint = token_endpoint
        self._access_token = access_token

    def obtain_access_token(self) -> str:
        import json
        import urllib.parse

        form = urllib.parse.urlencode({
            "client_id": self._client_id,
            "client_secret": self._client_secret,
            "scope": self._scope,
            "grant_type": "client_credentials",
            "claims": '{"roles": ["api-access"]}',
        }).encode("ascii")
        status, body = self._request(
            "POST", self._token_endpoint, form,
            {"Content-Type": "application/x-www-form-urlencoded"},
        )
        if status != 200:
            raise UploadError(f"Token retrieval failed [{status}]: {body[:500]}")
        token = json.loads(body).get("access_token")
        if token is None:
            raise UploadError("Failed to get token from token response")
        self._access_token = token
        return token

    def upload(self, ttl_text: str, to_db: str, graph_ns: str | None = None,
               verb: str | None = None) -> str:
        url, _, _ = resolve_db_url(to_db, self._server_url_var,
                                   self._password_var)
        post_url, verb = _build_url(url, graph_ns, verb)
        data = ttl_text.encode("utf-8")
        tries = 0
        while True:
            tries += 1
            if self._access_token is None:
                self.obtain_access_token()
            headers = {
                "Content-Type": "text/turtle",
                "Authorization": f"Bearer {self._access_token}",
            }
            status, body = self._request(verb, post_url, data, headers)
            if status in (401, 407):
                self._access_token = None  # token expired → refresh + retry
                if tries < self._max_retries:
                    continue
                raise UploadError(
                    f"Upload failed after {tries} auth retries [{status}]"
                )
            if status not in (200, 201):
                raise UploadError(f"Upload request failed [{status}]: {body[:500]}")
            return post_url

class DeviceCodeGraphUploader(OAuth2GraphUploader):
    """OAuth2 device-authorization-grant (RFC 8628) uploader — the headless
    equivalent of the reference runner's MSAL interactive login
    (``login_via_msal``, text_to_turtle_runner.py:434-477). The reference's
    three MSAL behaviors map to public-standard OAuth2:

    - ``app.get_accounts()`` + ``acquire_token_silent`` → a JSON token
      cache at ``cache_path`` (reused while unexpired, renewed via the
      ``refresh_token`` grant when the server issued one);
    - ``acquire_token_interactive`` (browser pop-up) → the device flow:
      POST ``device_endpoint``, show the user code / verification URI via
      ``prompt`` (mirroring the reference's "You are now authenticated at
      Stardog via Azure AD" NOTE block), poll ``token_endpoint`` honoring
      ``authorization_pending`` / ``slow_down`` / ``expires_in``;
    - the "Authenticated as <user>" confirmation → ``prompt`` of the
      token response's ``id_token_claims``-equivalent fields when present.

    Upload inherits the 401/407 token-reset retry loop from
    :class:`OAuth2GraphUploader`. ``prompt`` and ``sleep`` are injectable
    for tests and for embedding in non-TTY frontends.
    """

    def __init__(
        self,
        *,
        client_id: str,
        scope: str,
        device_endpoint: str,
        token_endpoint: str,
        cache_path: str | None = None,
        prompt=print,
        sleep=None,
        max_poll_seconds: float = 900.0,
        stardog_url_var: str = "STARDOG_SERVER",
        password_var: str = "STARDOG_PASSWORD",
        timeout: float = 30.0,
        max_retries: int = 3,
    ) -> None:
        import time as _time

        super().__init__(
            client_id=client_id, client_secret="", scope=scope,
            token_endpoint=token_endpoint, stardog_url_var=stardog_url_var,
            password_var=password_var, timeout=timeout,
            max_retries=max_retries,
        )
        self._device_endpoint = device_endpoint
        self._cache_path = cache_path
        self._prompt = prompt
        self._sleep = sleep if sleep is not None else _time.sleep
        self._max_poll_seconds = max_poll_seconds
        self._refresh_token: str | None = None

    # -- token cache (acquire_token_silent analogue) ---------------------
    def _cache_load(self) -> dict:
        import json

        if not self._cache_path or not os.path.exists(self._cache_path):
            return {}
        try:
            with open(self._cache_path, "r", encoding="utf-8") as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _cache_store(self, tok: dict) -> None:
        import json
        import time as _time

        self._access_token = tok.get("access_token")
        self._refresh_token = tok.get("refresh_token", self._refresh_token)
        if not self._cache_path:
            return
        rec = {
            "access_token": self._access_token,
            "refresh_token": self._refresh_token,
            # expire 60 s early so an in-flight upload never carries a
            # token that dies mid-request
            "expires_at": _time.time() + float(tok.get("expires_in", 0)) - 60,
        }
        tmp = f"{self._cache_path}.tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(rec, fh)
        os.replace(tmp, self._cache_path)

    def _form_post(self, url: str, form: dict) -> tuple[int, dict]:
        import json
        import urllib.parse

        status, body = self._request(
            "POST", url,
            urllib.parse.urlencode(form).encode("ascii"),
            {"Content-Type": "application/x-www-form-urlencoded"},
        )
        try:
            return status, json.loads(body)
        except ValueError:
            return status, {"error": "invalid_json",
                            "error_description": body[:300]}

    def _token_post(self, form: dict) -> tuple[int, dict]:
        return self._form_post(self._token_endpoint, form)

    def obtain_access_token(self) -> str:
        import json
        import time as _time

        # 1. silent: unexpired cached token
        cached = self._cache_load()
        if cached.get("access_token") and \
                float(cached.get("expires_at", 0)) > _time.time():
            self._access_token = cached["access_token"]
            self._refresh_token = cached.get("refresh_token")
            return self._access_token
        # 2. silent: refresh grant when a refresh token exists
        refresh = self._refresh_token or cached.get("refresh_token")
        if refresh:
            status, tok = self._token_post({
                "client_id": self._client_id, "scope": self._scope,
                "grant_type": "refresh_token", "refresh_token": refresh,
            })
            if status == 200 and tok.get("access_token"):
                self._cache_store(tok)
                return self._access_token
            self._refresh_token = None  # stale → fall through to device flow
        # 3. interactive: device flow
        status, dev = self._device_post()
        if status != 200 or "device_code" not in dev:
            raise UploadError(
                f"Device authorization failed [{status}]: "
                f"{json.dumps(dev)[:300]}")
        self._prompt(
            "NOTE: To authenticate at the graph store, visit "
            f"{dev.get('verification_uri') or dev.get('verification_url')} "
            f"and enter the code {dev.get('user_code')}.")
        interval = float(dev.get("interval", 5))
        deadline = _time.time() + min(self._max_poll_seconds,
                                      float(dev.get("expires_in", 900)))
        while True:
            if _time.time() >= deadline:
                raise UploadError("Device-code login timed out")
            self._sleep(interval)
            status, tok = self._token_post({
                "client_id": self._client_id, "scope": self._scope,
                "grant_type": "urn:ietf:params:oauth:grant-type:device_code",
                "device_code": dev["device_code"],
            })
            if status == 200 and tok.get("access_token"):
                self._cache_store(tok)
                who = tok.get("preferred_username") or tok.get("name")
                self._prompt(f"Authenticated as {who}" if who
                             else "Authenticated")
                return self._access_token
            err = tok.get("error", "")
            if err == "authorization_pending":
                continue
            if err == "slow_down":
                interval += 5.0
                continue
            raise UploadError(
                f"Failed to obtain access token [{status}]: "
                f"{err or json.dumps(tok)[:300]}")

    def _device_post(self) -> tuple[int, dict]:
        return self._form_post(self._device_endpoint, {
            "client_id": self._client_id, "scope": self._scope,
        })
