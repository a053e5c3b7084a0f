"""Single-use refresh-token rotation (the reference's
SingleUseRefreshTokenOauth2Authenticator, requests_native_auth/
abstract_oauth.py:169-249): when the token endpoint returns a new
refresh_token, the authenticator adopts it for subsequent grants and
surfaces it for persistence — the AirbyteControlMessage(CONNECTOR_CONFIG)
analog. Offline via injected transport + clock."""

from __future__ import annotations

from airbyte_spark.sources.auth import OAuth2Auth
from airbyte_spark.sources.declarative import ManifestSource


class TokenEndpoint:
    """Scripted token endpoint: each grant may rotate the refresh token;
    grants with a stale (already-used) refresh token fail — the single-use
    contract."""

    def __init__(self):
        self.valid_refresh = "R0"
        self.grants = 0

    def __call__(self, method, url, params=None, headers=None, body=None):
        if url.endswith("/token"):
            if params.get("refresh_token") != self.valid_refresh:
                return 401, {"error": "invalid_grant"}
            self.grants += 1
            self.valid_refresh = f"R{self.grants}"
            return 200, {
                "access_token": f"A{self.grants}",
                "expires_in": 100,
                "refresh_token": self.valid_refresh,
            }
        return 200, {"data": [{"id": 1}]}


def test_rotated_refresh_token_adopted_and_surfaced():
    ep = TokenEndpoint()
    now = [1000.0]
    seen: list[str] = []
    auth = OAuth2Auth(
        transport=ep,
        token_url="https://api.test/token",
        client_id="c",
        client_secret="s",
        refresh_token="R0",
        clock=lambda: now[0],
        on_refresh_token_update=seen.append,
    )
    assert auth.auth_header() == {"Authorization": "Bearer A1"}
    assert auth.refresh_token == "R1" and seen == ["R1"]
    # expire the access token: the SECOND grant must use the ROTATED
    # refresh token (a replay of R0 would 401 under the single-use rule)
    now[0] += 200
    assert auth.auth_header() == {"Authorization": "Bearer A2"}
    assert auth.refresh_token == "R2" and seen == ["R1", "R2"]


def test_manifest_emits_connector_config_control_message(spark):
    ep = TokenEndpoint()
    manifest = {
        "streams": [
            {
                "name": "items",
                "url": "https://api.test/items",
                "schema": {"id": "int"},
                "authenticator": {
                    "type": "oauth2",
                    "token_url": "https://api.test/token",
                    "client_id": "c",
                    "client_secret": "s",
                    "refresh_token": "R0",
                },
            }
        ]
    }
    src = ManifestSource(manifest, ep)
    msgs = list(src.read_messages(spark, {}))
    controls = [m for m in msgs if m["type"] == "CONTROL"]
    assert controls == [
        {
            "type": "CONTROL",
            "control": {
                "type": "CONNECTOR_CONFIG",
                "connectorConfig": {
                    "stream": "items",
                    "config": {"authenticator": {"refresh_token": "R1"}},
                },
            },
        }
    ]
    # records still flowed normally around the rotation
    assert sum(1 for m in msgs if m["type"] == "RECORD") == 1
