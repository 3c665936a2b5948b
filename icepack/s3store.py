"""S3-protocol MetadataStore adapter (public S3 REST API, stdlib-only).

The storage seam (:mod:`icepack.storage`) maps 1:1 onto S3 operations
— the mapping documented at storage.py:19-23, now implemented:

- ``read_text``        → GET Object (404 → FileNotFoundError)
- ``replace_text``     → PUT Object (single-object PUT is atomic in S3:
                          readers see the old or new body, never partial)
- ``create_exclusive`` → PUT Object with ``If-None-Match: *`` — S3's
                          conditional write (publicly GA since 2024);
                          412 PreconditionFailed → FileExistsError, which
                          is exactly the version-file CAS the commit
                          protocol needs
- ``delete``           → DELETE Object (idempotent)
- ``exists``/``mtime`` → HEAD Object
- ``glob``             → ListObjectsV2 (prefix = the pattern's fixed
                          stem, client-side fnmatch for the rest,
                          continuation-token pagination)
- ``mkdirs``           → no-op (flat keyspace)

Paths are ``s3://bucket/key`` URIs; requests are signed with
:mod:`icepack.sigv4` (AWS public signing spec).  The *transport* seam
(callable ``(method, url, headers, body) → (status, headers, body)``)
matches restcat/gluecat: tests run the full table-metadata lifecycle
against an in-process loopback S3 server that VERIFIES each request's
SigV4 signature server-side before serving it, which is the honest
offline maximum — a real deployment changes the endpoint and
credentials, nothing else.
"""

from __future__ import annotations

import fnmatch
import posixpath
import urllib.error
import urllib.request
from email.utils import parsedate_to_datetime
from urllib.parse import quote, urlparse

from .sigv4 import canonical_query, sign
from .storage import MetadataStore


def _default_transport(method, url, headers, body):
    req = urllib.request.Request(url, data=body or None, method=method)
    for k, v in headers.items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


class S3Store(MetadataStore):
    def __init__(
        self,
        endpoint: str,
        *,
        bucket: str | None = None,
        region: str = "us-east-1",
        access_key: str,
        secret_key: str,
        session_token: str | None = None,
        transport=None,
    ):
        """*bucket* is the default bucket for LOCAL-style paths: like
        InMemoryStore, the adapter accepts a table whose LOCATION is a
        local filesystem path (Spark writes parquet there; no hadoop-
        aws jar exists offline) while every metadata document lives as
        an S3 object keyed by that path — the metadata/data split of a
        real object-store deployment.  ``s3://bucket/key`` URIs are
        also accepted directly."""
        self.endpoint = endpoint.rstrip("/")
        self.bucket = bucket
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.session_token = session_token
        self.transport = transport or _default_transport
        self._host = urlparse(self.endpoint).netloc

    # -- request plumbing ---------------------------------------------------

    def _split(self, path: str) -> tuple[str, str]:
        u = urlparse(path)
        if u.scheme == "s3":
            return u.netloc, u.path.lstrip("/")
        if self.bucket is None:
            raise ValueError(
                f"S3Store without a default bucket takes s3:// URIs, got {path!r}"
            )
        return self.bucket, path.lstrip("/")

    def _request(
        self, method: str, bucket: str, key: str, query: dict | None = None,
        body: bytes = b"", extra_headers: dict | None = None,
    ):
        query = query or {}
        url_path = "/" + bucket + ("/" + key if key else "")
        headers = {"host": self._host, **(extra_headers or {})}
        signed = sign(
            method,
            url_path,
            query,
            headers,
            body,
            access_key=self.access_key,
            secret_key=self.secret_key,
            region=self.region,
            service="s3",
            session_token=self.session_token,
        )
        qs = canonical_query(query)
        url = self.endpoint + quote(url_path, safe="/-_.~") + ("?" + qs if qs else "")
        signed.pop("host", None)  # urllib sets Host itself; it was signed
        return self.transport(method, url, signed, body)

    # -- MetadataStore ------------------------------------------------------

    def canonical(self, path: str) -> str:
        if path.startswith("s3://"):
            return path
        import os

        return os.path.abspath(path)  # local-style keys, like InMemoryStore

    def join(self, *parts: str) -> str:
        head, tail = parts[0], [p.strip("/") for p in parts[1:]]
        return posixpath.join(head.rstrip("/"), *tail)

    def exists(self, path: str) -> bool:
        b, k = self._split(path)
        status, _, _ = self._request("HEAD", b, k)
        return status == 200

    def read_text(self, path: str) -> str:
        b, k = self._split(path)
        status, _, body = self._request("GET", b, k)
        if status == 404:
            raise FileNotFoundError(path)
        if status != 200:
            raise OSError(f"S3 GET {path}: HTTP {status}")
        return body.decode("utf-8")

    def create_exclusive(self, path: str, text: str) -> None:
        b, k = self._split(path)
        status, _, _ = self._request(
            "PUT", b, k, body=text.encode("utf-8"),
            extra_headers={"if-none-match": "*"},
        )
        if status == 412:
            raise FileExistsError(path)
        if status != 200:
            raise OSError(f"S3 conditional PUT {path}: HTTP {status}")

    def replace_text(self, path: str, text: str) -> None:
        b, k = self._split(path)
        status, _, _ = self._request("PUT", b, k, body=text.encode("utf-8"))
        if status != 200:
            raise OSError(f"S3 PUT {path}: HTTP {status}")

    def delete(self, path: str) -> None:
        b, k = self._split(path)
        status, _, _ = self._request("DELETE", b, k)
        if status not in (200, 204, 404):
            raise OSError(f"S3 DELETE {path}: HTTP {status}")

    def glob(self, pattern: str) -> list[str]:
        b, pat = self._split(pattern)
        # fixed stem up to the first wildcard = server-side prefix
        cut = len(pat)
        for ch in "*?[":
            i = pat.find(ch)
            if i != -1:
                cut = min(cut, i)
        prefix = pat[:cut]
        keys, token = [], None
        while True:
            q = {"list-type": "2", "prefix": prefix}
            if token:
                q["continuation-token"] = token
            status, _, body = self._request("GET", b, "", query=q)
            if status != 200:
                raise OSError(f"S3 LIST {b}/{prefix}: HTTP {status}")
            text = body.decode("utf-8")
            keys += _xml_all(text, "Key")
            token = (_xml_all(text, "NextContinuationToken") or [None])[0]
            if not token:
                break
        # answer in the caller's path style: s3:// URIs for URI
        # patterns, local-style absolute paths for local-style ones
        # (consumers feed results straight back into store methods)
        uri_style = pattern.startswith("s3://")
        return sorted(
            (f"s3://{b}/{k}" if uri_style else "/" + k)
            for k in keys
            if fnmatch.fnmatch(k, pat)
        )

    def mtime_ms(self, path: str) -> int:
        b, k = self._split(path)
        status, headers, _ = self._request("HEAD", b, k)
        if status != 200:
            raise FileNotFoundError(path)
        lm = {k.lower(): v for k, v in headers.items()}.get("last-modified")
        return int(parsedate_to_datetime(lm).timestamp() * 1000)

    def mkdirs(self, path: str) -> None:
        pass  # flat keyspace


def _xml_all(text: str, tag: str) -> list[str]:
    """All <tag>...</tag> values (ListObjectsV2 responses are flat —
    no attributes, no nesting of the tags we read)."""
    out, start = [], 0
    open_t, close_t = f"<{tag}>", f"</{tag}>"
    while True:
        i = text.find(open_t, start)
        if i == -1:
            return out
        j = text.find(close_t, i)
        out.append(text[i + len(open_t) : j])
        start = j + len(close_t)


# --------------------------------------------------------------- loopback


class LoopbackS3Handler:
    """Factory for the offline proof server: an in-process S3 endpoint
    (GET/HEAD/PUT+If-None-Match/DELETE/ListObjectsV2) that VERIFIES
    every request's SigV4 signature against the shared secret before
    serving — used by tests and the ``ice46_s3_store`` driver query.
    ``make(access, secret, region)`` returns a BaseHTTPRequestHandler
    subclass with fresh object/bad-auth state."""

    @staticmethod
    def make(access: str, secret: str, region: str):
        import threading
        from email.utils import formatdate
        from http.server import BaseHTTPRequestHandler
        from urllib.parse import parse_qsl, unquote, urlparse

        from .sigv4 import sign as _sign

        class _H(BaseHTTPRequestHandler):
            objects: dict = {}
            lock = threading.Lock()
            bad_auth: list = []

            def log_message(self, *a):
                pass

            def _verify(self, body: bytes) -> bool:
                auth = self.headers.get("Authorization", "")
                try:
                    signed_names = auth.split("SignedHeaders=")[1].split(",")[0]
                except IndexError:
                    return False
                hdrs = {}
                for name in signed_names.split(";"):
                    if name in (
                        "x-amz-date",
                        "x-amz-content-sha256",
                        "x-amz-security-token",
                    ):
                        continue  # sign() re-adds these
                    hdrs[name] = self.headers.get(name, "")
                u = urlparse(self.path)
                expect = _sign(
                    self.command,
                    unquote(u.path),
                    dict(parse_qsl(u.query, keep_blank_values=True)),
                    hdrs,
                    body,
                    access_key=access,
                    secret_key=secret,
                    region=region,
                    service="s3",
                    amz_date=self.headers.get("x-amz-date"),
                )["Authorization"]
                if expect != auth:
                    _H.bad_auth.append((self.command, self.path))
                    return False
                return True

            def _bk(self):
                u = urlparse(self.path)
                parts = unquote(u.path).lstrip("/").split("/", 1)
                return parts[0], (parts[1] if len(parts) > 1 else "")

            def _respond(self, status, body=b"", headers=None):
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if not self._verify(b""):
                    return self._respond(403)
                bucket, key = self._bk()
                q = dict(parse_qsl(urlparse(self.path).query))
                if q.get("list-type") == "2":
                    prefix = q.get("prefix", "")
                    with self.lock:
                        ks = sorted(
                            k
                            for (b, k) in self.objects
                            if b == bucket and k.startswith(prefix)
                        )
                    xml = (
                        "<ListBucketResult>"
                        + "".join(
                            f"<Contents><Key>{k}</Key></Contents>" for k in ks
                        )
                        + "</ListBucketResult>"
                    )
                    return self._respond(200, xml.encode())
                with self.lock:
                    obj = self.objects.get((bucket, key))
                if obj is None:
                    return self._respond(404)
                return self._respond(200, obj[0])

            def do_HEAD(self):
                if not self._verify(b""):
                    return self._respond(403)
                bucket, key = self._bk()
                with self.lock:
                    obj = self.objects.get((bucket, key))
                if obj is None:
                    return self._respond(404)
                return self._respond(
                    200,
                    b"",
                    {"Last-Modified": formatdate(obj[1] / 1000, usegmt=True)},
                )

            def do_PUT(self):
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                if not self._verify(body):
                    return self._respond(403)
                bucket, key = self._bk()
                import time

                with self.lock:
                    if (
                        self.headers.get("if-none-match") == "*"
                        and (bucket, key) in self.objects
                    ):
                        return self._respond(412)  # conditional write: CAS refused
                    self.objects[(bucket, key)] = (body, int(time.time() * 1000))
                return self._respond(200)

            def do_DELETE(self):
                if not self._verify(b""):
                    return self._respond(403)
                bucket, key = self._bk()
                with self.lock:
                    self.objects.pop((bucket, key), None)
                return self._respond(204)

        return _H
