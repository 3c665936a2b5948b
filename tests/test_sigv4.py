"""SigV4 signing pinned against AWS's PUBLIC documented example (the
"Signature Version 4 signing process" GET iam ListUsers walkthrough,
whose intermediate hashes and final signature AWS publishes)."""

import hashlib
import hmac

from icepack.sigv4 import canonical_query, sign, signing_key


def test_signing_key_documented_example():
    """AWS publishes the derived-key example for
    wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY, 20150830/us-east-1/iam."""
    k = signing_key(
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "20150830", "us-east-1", "iam"
    )
    assert k.hex() == (
        "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9"
    )


def test_full_signature_documented_example():
    """End-to-end: the documented ListUsers request must produce the
    documented final signature."""
    headers = sign(
        "GET",
        "/",
        {"Action": "ListUsers", "Version": "2010-05-08"},
        {
            "host": "iam.amazonaws.com",
            "content-type": "application/x-www-form-urlencoded; charset=utf-8",
        },
        b"",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        service="iam",
        amz_date="20150830T123600Z",
    )
    auth = headers["Authorization"]
    assert auth.startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request"
    )
    assert "SignedHeaders=content-type;host;x-amz-date" in auth
    assert auth.endswith(
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_canonical_query_sorted_and_encoded():
    assert canonical_query({"b": "2", "a": "1 2", "c": "~x"}) == "a=1%202&b=2&c=~x"


def test_s3_service_adds_content_sha256():
    h = sign(
        "PUT",
        "/bucket/key",
        {},
        {"host": "s3.amazonaws.com"},
        b"hello",
        access_key="AK",
        secret_key="SK",
        region="us-east-1",
        service="s3",
        amz_date="20240101T000000Z",
    )
    assert h["x-amz-content-sha256"] == hashlib.sha256(b"hello").hexdigest()
    assert "x-amz-content-sha256" in h["Authorization"]
