"""AWS Signature Version 4 request signing (public spec).

Implements the documented SigV4 process (canonical request → string to
sign → derived signing key → Authorization header) from the public AWS
"Signature Version 4 signing process" documentation — no SDK.  This is
the missing production leg of the injectable transports in
:mod:`icepack.gluecat` (AWS JSON 1.1 Glue calls) and the S3 metadata
store (:mod:`icepack.s3store`): both were loopback-verified with
unsigned transports; composing ``sign`` into their request functions
is all a real deployment adds (plus credentials).

Pinned offline against the documented public example (GET iam
ListUsers, AKIDEXAMPLE, us-east-1, 2015-08-30) whose expected
signature AWS publishes — see tests/test_sigv4.py.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
from urllib.parse import quote


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def canonical_query(params: dict[str, str]) -> str:
    """Query parameters URI-encoded per the spec and sorted by name."""
    pairs = []
    for k in sorted(params):
        pairs.append(
            quote(str(k), safe="-_.~") + "=" + quote(str(params[k]), safe="-_.~")
        )
    return "&".join(pairs)


def signing_key(secret_key: str, date: str, region: str, service: str) -> bytes:
    """kSigning = HMAC-chain over date/region/service/aws4_request."""
    k = _hmac(("AWS4" + secret_key).encode("utf-8"), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sign(
    method: str,
    url_path: str,
    query: dict[str, str],
    headers: dict[str, str],
    payload: bytes,
    *,
    access_key: str,
    secret_key: str,
    region: str,
    service: str,
    amz_date: str | None = None,
    session_token: str | None = None,
) -> dict[str, str]:
    """Return the headers to send: the input headers plus
    ``x-amz-date``, ``x-amz-content-sha256``, optional
    ``x-amz-security-token``, and ``Authorization``.

    *amz_date* (``YYYYMMDDTHHMMSSZ``) defaults to now — pass it
    explicitly in tests for determinism."""
    if amz_date is None:
        amz_date = _dt.datetime.utcnow().strftime("%Y%m%dT%H%M%SZ")
    date = amz_date[:8]
    payload_hash = _sha256_hex(payload)

    out = dict(headers)
    out["x-amz-date"] = amz_date
    if service == "s3":
        # S3 requires the payload hash as a signed header
        out["x-amz-content-sha256"] = payload_hash
    if session_token:
        out["x-amz-security-token"] = session_token

    canon_headers = {k.lower().strip(): " ".join(str(v).split()) for k, v in out.items()}
    signed_names = ";".join(sorted(canon_headers))
    # Canonical URI: single URI-encoding, which is exact for S3 (the
    # spec forbids double-encoding there) and for services whose paths
    # are plain "/" (Glue JSON-1.1 — the other caller here).  Services
    # that require the spec's double-encoding of exotic path segments
    # would need quote() applied twice; none of our callers do.
    canonical_request = "\n".join(
        [
            method.upper(),
            quote(url_path, safe="/-_.~"),
            canonical_query(query),
            "".join(f"{k}:{canon_headers[k]}\n" for k in sorted(canon_headers)),
            signed_names,
            payload_hash,
        ]
    )
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            _sha256_hex(canonical_request.encode("utf-8")),
        ]
    )
    sig = hmac.new(
        signing_key(secret_key, date, region, service),
        string_to_sign.encode("utf-8"),
        hashlib.sha256,
    ).hexdigest()
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_names}, Signature={sig}"
    )
    return out
