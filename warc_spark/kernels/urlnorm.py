"""URL normalization kernel + vectorized pandas variants.

Wired into the frontier's link-emission path via
``FrontierConfig.normalize_links`` (href aliases collapse to one fetch;
tests/test_frontier.py::TestLinkNormalization). Deterministic and
vectorizable: the pandas variants operate on whole Series with pandas string
ops (no per-row Python in the Spark hot path, per BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import pandas as pd

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):\/\/")
# scheme://host[:port]/path?query#fragment
_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.\-]*):\/\/(?P<host>[^\/:?#]*)"
    r"(?::(?P<port>\d*))?(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_url(url: str) -> str | None:
    """Canonical form: lower-case scheme+host, strip default port and
    fragment, ensure non-empty path. Returns None for non-absolute urls."""
    m = _URL_RE.match(url or "")
    if not m:
        return None
    scheme = m.group("scheme").lower()
    host = m.group("host").lower().rstrip(".")
    port = m.group("port")
    path = m.group("path") or "/"
    query = m.group("query")
    netloc = host
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def host_of(url: str) -> str | None:
    m = _URL_RE.match(url or "")
    return m.group("host").lower().rstrip(".") if m else None


def path_of(url: str) -> str:
    m = _URL_RE.match(url or "")
    return (m.group("path") or "/") if m else "/"


# ---- vectorized (pandas Series in/out, for pandas_udf wrappers) ----------

def normalize_url_series(urls: pd.Series) -> pd.Series:
    ext = urls.str.extract(_URL_RE, expand=True)
    scheme = ext["scheme"].str.lower()
    host = ext["host"].str.lower().str.rstrip(".")
    port = ext["port"]
    path = ext["path"].replace("", "/").fillna("/")
    query = ext["query"]
    default = scheme.map(_DEFAULT_PORTS).fillna("")
    keep_port = port.notna() & (port != "") & (port != default)
    netloc = host.where(~keep_port, host + ":" + port.fillna(""))
    out = scheme + "://" + netloc + path
    out = out.where(query.isna() | (query == ""), out + "?" + query.fillna(""))
    return out.where(ext["scheme"].notna(), None)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.str.extract(_URL_RE, expand=True)["host"].str.lower().str.rstrip(".")
