"""Docs SQL sweep: every SQL statement in the reference's 12 documents
must ROUTE to an implementation in the IceSQL front-end — none may fall
through to the unsupported-statement error.

Statements are extracted from the ```sql fences verbatim (comments
stripped, <placeholders> substituted) and fed to the router WITHOUT
their narrative context, so analysis errors about missing tables are
expected and tolerated; what this pins is statement-form coverage: the
dialect surface the reference documents is the dialect this engine
parses.  Individually context-complete examples are executed end to end
elsewhere (test_sql.py's *_verbatim tests, test_txn.py, ice13/ice25/
ice32/ice36 driver queries).
"""

import glob
import os
import re

import pytest

from icepack.sql import IceSQL

DOCS = "/root/reference/docs"


def _statements():
    out = []
    for f in sorted(glob.glob(os.path.join(DOCS, "*.md"))):
        text = open(f).read()
        for m in re.finditer(r"```sql\n(.*?)```", text, re.DOTALL):
            block = re.sub(r"--[^\n]*", "", m.group(1))
            for s in block.split(";"):
                s = s.strip()
                if s:
                    out.append((os.path.basename(f), s))
    return out


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs not present")
def test_every_docs_statement_routes(spark, tmp_path):
    stmts = _statements()
    assert len(stmts) >= 90  # the docs carry ~97; guard against regex rot
    isql = IceSQL(spark, str(tmp_path / "wh"))
    unsupported = []
    for doc, s in stmts:
        s = re.sub(r"<([\w ]+)>", lambda m: m.group(1).replace(" ", "_"), s)
        try:
            isql.sql(s)
        except NotImplementedError as e:
            unsupported.append((doc, s.splitlines()[0][:70], str(e)[:80]))
        except Exception:
            pass  # missing-context analysis errors: routing happened
    assert unsupported == []
