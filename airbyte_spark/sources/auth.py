"""Request authenticators for the HTTP stream source.

Reference semantics (airbyte-cdk/python/airbyte_cdk/sources/streams/http/
requests_native_auth/):

- ``token.py`` TokenAuthenticator / BasicHttpAuthenticator: a static
  credential rendered as an ``Authorization`` header on every request.
- ``abstract_oauth.py:53-68`` AbstractOauth2Authenticator.get_auth_header:
  return ``Bearer <access_token>``, refreshing first whenever the cached
  token is absent or past its expiry date; ``:136`` reads
  (access_token, expires_in) out of the refresh response.

The transport and the clock are both injected so token lifecycles are
fully testable offline — the same design as the source itself.  Every
authenticator exposes one method, ``auth_header() -> dict[str, str]``,
evaluated PER REQUEST (not per sync) so a token expiring mid-pagination
refreshes transparently.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from airbyte_spark.lineage import log_metric

Transport = Callable[..., tuple[int, Any]]


@dataclass
class StaticTokenAuth:
    """TokenAuthenticator: a fixed ``<method> <token>`` Authorization header
    (requests_native_auth/token.py)."""

    token: str
    auth_method: str = "Bearer"

    def auth_header(self) -> dict[str, str]:
        return {"Authorization": f"{self.auth_method} {self.token}"}


@dataclass
class BasicHttpAuth:
    """BasicHttpAuthenticator: base64(user:password) Authorization header
    (requests_native_auth/token.py BasicHttpAuthenticator)."""

    username: str
    password: str = ""

    def auth_header(self) -> dict[str, str]:
        import base64

        raw = f"{self.username}:{self.password}".encode()
        return {"Authorization": f"Basic {base64.b64encode(raw).decode()}"}


@dataclass
class OAuth2Auth:
    """Oauth2Authenticator: refresh-token grant with cached access token.

    ``auth_header()`` refreshes iff the cached token is missing or within
    ``expiry_margin_s`` of expiry (abstract_oauth.py:53-68 token_has_expired
    check, with a safety margin so a token never dies mid-request), then
    returns the Bearer header. ``invalidate()`` drops the cached token —
    the source calls it on a 401 so a server-side revocation triggers one
    forced refresh instead of a hard failure.

    Single-use refresh tokens (the reference's
    SingleUseRefreshTokenOauth2Authenticator, abstract_oauth.py:169-249):
    when the token endpoint ROTATES the refresh token (returns a new
    ``refresh_token`` in the grant response), the authenticator adopts it
    for subsequent refreshes and calls ``on_refresh_token_update(new)`` so
    the caller can persist it — the analog of the reference emitting an
    AirbyteControlMessage(CONNECTOR_CONFIG) to update the stored config;
    without persistence the next sync would replay a dead token.
    """

    transport: Transport
    token_url: str
    client_id: str
    client_secret: str
    refresh_token: str
    scopes: list[str] | None = None
    expiry_margin_s: float = 30.0
    clock: Callable[[], float] = time.time  # injectable for tests
    on_refresh_token_update: Callable[[str], None] | None = None

    _access_token: str | None = field(default=None, repr=False)
    _expires_at: float = field(default=0.0, repr=False)

    def _token_valid(self) -> bool:
        return (
            self._access_token is not None
            and self.clock() < self._expires_at - self.expiry_margin_s
        )

    def _refresh(self) -> None:
        """POST the refresh-token grant (abstract_oauth.py:96-136
        build_refresh_request_body / refresh_access_token)."""
        body = {
            "grant_type": "refresh_token",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
            "refresh_token": self.refresh_token,
        }
        if self.scopes:
            body["scopes"] = " ".join(self.scopes)
        status, resp = self.transport("POST", self.token_url, params=body, headers={})
        if status >= 400:
            raise RuntimeError(f"OAuth2 token refresh failed: HTTP {status}")
        self._access_token = resp["access_token"]
        self._expires_at = self.clock() + float(resp.get("expires_in", 3600))
        rotated = resp.get("refresh_token")
        if rotated and rotated != self.refresh_token:
            self.refresh_token = rotated
            log_metric("oauth2_refresh_token_rotated", token_url=self.token_url)
            if self.on_refresh_token_update is not None:
                self.on_refresh_token_update(rotated)
        log_metric(
            "oauth2_token_refreshed",
            token_url=self.token_url,
            expires_in=float(resp.get("expires_in", 3600)),
        )

    def invalidate(self) -> None:
        self._access_token = None
        self._expires_at = 0.0

    def auth_header(self) -> dict[str, str]:
        if not self._token_valid():
            self._refresh()
        return {"Authorization": f"Bearer {self._access_token}"}
