"""Authentication & authorization: API keys, tokens, restricted datasets.

Reference surface:

- app/authentication/api_keys.py — x-api-key extraction from header or
  query param, domain-wildcard + expiry validation, 403 when absent;
- app/authentication/token.py — bearer-token users with roles/apps,
  ``is_authorized_for_query`` returning 401 for restricted datasets
  unless the user is an ADMIN of gfw/gfw-pro;
- app/crud/api_keys.py — key lifecycle (uuid4 keys, 1-year default
  expiry, per-user listing);
- app/routes/authentication/authentication.py — /auth routes.

The reference delegates identity to an external service (RW-API
``who_am_i``); this engine is self-contained, so ``TokenAuthenticator``
keeps a local token→user table with the same ``User`` shape and accepts
a ``resolver`` callable as the seam where an external identity service
would plug in. Everything else (key validation semantics, status codes,
error messages) matches the reference contract.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import asdict, dataclass, field
from datetime import datetime, timedelta
from typing import Callable
from urllib.parse import urlparse

API_KEY_NAME = "x-api-key"

# settings/globals.py:184-187 — deployment config; overridable per app
DEFAULT_PROTECTED_DATASETS = frozenset({"wdpa_licensed_protected_areas"})
DEFAULT_PROTECTED_VERSIONS = frozenset({"umd_tree_cover_loss/v1.1"})

RESTRICTED_MSG = "Unauthorized query on a restricted dataset or version"


class AuthError(Exception):
    """Authentication/authorization failure with an HTTP status."""

    def __init__(self, detail: str, status_code: int):
        super().__init__(detail)
        self.detail = detail
        self.status_code = status_code


@dataclass
class User:
    """authentication/token.py User shape (role + app grants)."""

    id: str
    name: str = ""
    email: str = ""
    role: str = "USER"  # USER | MANAGER | ADMIN
    apps: list[str] = field(default_factory=list)


class TokenAuthenticator:
    """Local bearer-token identity provider with an external-resolver seam.

    ``resolver(token) -> User | None`` is consulted after the local
    table, mirroring how the reference asks RW-API ``who_am_i``.
    """

    def __init__(self, resolver: Callable[[str], User | None] | None = None):
        self._tokens: dict[str, User] = {}
        self._credentials: dict[str, tuple[str, str]] = {}  # user → (pw, token)
        self._resolver = resolver

    def register(self, user: User, token: str | None = None) -> str:
        token = token or uuid.uuid4().hex
        self._tokens[token] = user
        return token

    def add_credentials(self, username: str, password: str, user: User) -> str:
        token = self.register(user)
        self._credentials[username] = (password, token)
        return token

    def login(self, username: str, password: str) -> str:
        cred = self._credentials.get(username)
        if cred is None or cred[0] != password:
            raise AuthError("Unauthorized", 401)
        return cred[1]

    def who_am_i(self, token: str) -> User:
        user = self._tokens.get(token)
        if user is None and self._resolver is not None:
            user = self._resolver(token)
        if user is None:
            raise AuthError(
                "Unauthorized access - this operation requires user "
                "authentication via a token",
                401,
            )
        return user


# ---------------------------------------------------------------------------
# API keys
# ---------------------------------------------------------------------------


@dataclass
class ApiKey:
    """models/orm/api_keys.py columns, JSON-serializable."""

    api_key: str
    alias: str | None
    user_id: str
    organization: str
    email: str
    domains: list[str]
    expires_on: str | None  # ISO timestamp; None = never
    created_on: str


class ApiKeyStore:
    """JSON-file key registry (crud/api_keys.py lifecycle, no gateway)."""

    def __init__(self, path: str):
        self._path = path
        self._keys: dict[str, ApiKey] = {}
        if os.path.exists(path):
            with open(path) as fh:
                for item in json.load(fh):
                    self._keys[item["api_key"]] = ApiKey(**item)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self._path) or ".", exist_ok=True)
        tmp = self._path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump([asdict(k) for k in self._keys.values()], fh, indent=1)
        os.replace(tmp, self._path)

    def create(
        self,
        user: User,
        alias: str | None,
        organization: str,
        email: str,
        domains: list[str],
        never_expires: bool = False,
    ) -> ApiKey:
        if not isinstance(domains, list):
            raise AuthError("Domains must be a list of strings.", 422)
        if never_expires and user.role != "ADMIN":
            raise AuthError(
                f"Users with role {user.role} cannot set `never_expires` "
                "to True.",
                400,
            )
        for key in self.for_user(user.id):
            if key.alias == alias:
                raise AuthError(
                    "Key with specified alias already exists; use a "
                    "different alias",
                    409,
                )
        now = datetime.utcnow()
        key = ApiKey(
            api_key=str(uuid.uuid4()),
            alias=alias,
            user_id=user.id,
            organization=organization,
            email=email,
            domains=list(domains),
            expires_on=None if never_expires else (now + timedelta(days=365)).isoformat(),
            created_on=now.isoformat(),
        )
        self._keys[key.api_key] = key
        self._save()
        return key

    def get(self, api_key: str) -> ApiKey | None:
        return self._keys.get(api_key)

    def for_user(self, user_id: str) -> list[ApiKey]:
        return [k for k in self._keys.values() if k.user_id == user_id]

    def delete(self, api_key: str) -> ApiKey:
        key = self._keys.pop(api_key, None)
        if key is None:
            raise AuthError("The requested API key does not exist.", 404)
        self._save()
        return key


def _to_regex(domain: str) -> str:
    # wildcard domains: "*.globalforestwatch.org" (api_keys.py:120-122)
    return "^" + domain.replace(".", r"\.").replace("*", ".*") + "$"


def _extract_domain(url: str) -> str:
    parts = urlparse(url)
    host = parts.netloc or parts.path
    return host.split(":")[0]


def api_key_is_valid(
    domains: list[str],
    expires_on: str | None = None,
    origin: str | None = None,
    referrer: str | None = None,
) -> bool:
    """Domain + expiry validation (api_keys.py:62-94 semantics)."""
    if not domains:
        is_valid = True
    elif origin:
        is_valid = any(
            re.search(_to_regex(d), _extract_domain(origin)) for d in domains
        )
    elif referrer:
        is_valid = any(
            re.search(_to_regex(d), _extract_domain(referrer)) for d in domains
        )
    else:
        is_valid = False
    if expires_on is not None and datetime.fromisoformat(expires_on) < datetime.utcnow():
        is_valid = False
    return is_valid


# ---------------------------------------------------------------------------
# WSGI-request helpers
# ---------------------------------------------------------------------------


def extract_api_key(environ: dict, params: dict) -> str | None:
    """Header first, then query param (get_api_key checks both)."""
    header = environ.get("HTTP_X_API_KEY")
    if header:
        return header
    vals = params.get(API_KEY_NAME)
    return vals[0] if vals else None


def extract_bearer_token(environ: dict) -> str | None:
    raw = environ.get("HTTP_AUTHORIZATION", "")
    if raw.lower().startswith("bearer "):
        return raw[7:].strip()
    return None


@dataclass
class AuthConfig:
    """Everything create_app needs to enforce the reference's auth."""

    token_auth: TokenAuthenticator
    key_store: ApiKeyStore
    protected_datasets: frozenset[str] = DEFAULT_PROTECTED_DATASETS
    protected_versions: frozenset[str] = DEFAULT_PROTECTED_VERSIONS
    require_api_key: bool = True

    def check_api_key(self, environ: dict, params: dict) -> str:
        """403 unless a known, domain/expiry-valid key is presented."""
        api_key = extract_api_key(environ, params)
        if api_key:
            row = self.key_store.get(api_key)
            if row is not None and api_key_is_valid(
                row.domains,
                row.expires_on,
                environ.get("HTTP_ORIGIN"),
                environ.get("HTTP_REFERER"),
            ):
                return api_key
        raise AuthError("No valid API Key found.", 403)

    def check_query_authorized(
        self, environ: dict, dataset: str, version: str
    ) -> None:
        """token.py is_authorized_for_query — 401 on restricted data
        unless the bearer user is an ADMIN of gfw or gfw-pro."""
        if (
            dataset not in self.protected_datasets
            and f"{dataset}/{version}" not in self.protected_versions
        ):
            return
        token = extract_bearer_token(environ)
        if token is None:
            raise AuthError(RESTRICTED_MSG, 401)
        try:
            user = self.token_auth.who_am_i(token)
        except AuthError:
            raise AuthError(RESTRICTED_MSG, 401) from None
        if user.role != "ADMIN" or not any(
            app in user.apps for app in ("gfw", "gfw-pro")
        ):
            raise AuthError(RESTRICTED_MSG, 401)

    def get_user(self, environ: dict) -> User:
        token = extract_bearer_token(environ)
        if token is None:
            raise AuthError(
                "Unauthorized access - this operation requires user "
                "authentication via a token",
                401,
            )
        return self.token_auth.who_am_i(token)
