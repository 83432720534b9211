"""CAS store contract vs a REAL service emulator (the r13 audit ask).

``tests/test_cas_lock.py`` drives hand-written fakes that encode OUR
reading of the 412/409/ConditionalCheckFailed semantics; this module
closes that loop by running the same primitive contract — plus the
manifest lost-update invariant — against moto's S3 and DynamoDB
implementations, which are maintained against the real services'
documented behavior. Anywhere our fake and moto disagree, these tests
catch the misreading.

Coverage and honest gaps:

- S3CASStore over moto S3: conditional ``PutObject If-None-Match: *``
  (create-exclusive), ``PutObject If-Match`` (the renewal primitive),
  ``DeleteObject If-Match`` (the steal). Note moto enforces the
  conditional delete on every bucket; real S3 general-purpose buckets
  answer 501 there (directory-bucket feature) — that path keeps its
  loud NotImplementedError contract test against the fake
  (``test_s3_conditional_delete_unsupported_bucket_is_loud``).
- DynamoDBCASStore over moto DynamoDB: ``attribute_not_exists``
  create-exclusive, full-value conditional delete, full-value
  conditional replace.
- GCSCASStore: NO emulator here — google-cloud-storage (the client
  the class constructs) is not installed in this container and
  fake-gcs-server would need a network service; the generation-match
  semantics stay contract-tested against the in-repo fake, which
  mirrors the public GCS documentation (preconditions on generation,
  412 on mismatch, 404 on absence). Adjudicated in COVERAGE.md next
  to the WebP precedent; installing google-cloud-storage makes
  ``GCSCASStore(client=...)`` testable against fake-gcs-server with
  zero code changes.

Skipped loudly when moto/boto3 are absent.
"""

from __future__ import annotations

import os
import threading

import pytest

moto = pytest.importorskip("moto", reason="moto not installed")
boto3 = pytest.importorskip("boto3", reason="boto3 not installed")

from fintech_etl_spark.sinks import manifest as mf  # noqa: E402
from fintech_etl_spark.sinks.locks import (  # noqa: E402
    CASLockProvider,
    DynamoDBCASStore,
    S3CASStore,
)


@pytest.fixture()
def aws():
    # moto intercepts botocore in-process; dummy creds keep boto3 quiet
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    with moto.mock_aws():
        yield


def _s3_store(prefix="locks"):
    client = boto3.client("s3", region_name="us-east-1")
    client.create_bucket(Bucket="cas-contract-bucket")
    return S3CASStore("cas-contract-bucket", prefix=prefix, client=client)


def _ddb_store():
    client = boto3.client("dynamodb", region_name="us-east-1")
    client.create_table(
        TableName="cas-locks",
        KeySchema=[{"AttributeName": "lock_key", "KeyType": "HASH"}],
        AttributeDefinitions=[
            {"AttributeName": "lock_key", "AttributeType": "S"}
        ],
        BillingMode="PAY_PER_REQUEST",
    )
    return DynamoDBCASStore("cas-locks", client=client)


@pytest.mark.parametrize("mk", [_s3_store, lambda: _ddb_store()],
                         ids=["s3-moto", "ddb-moto"])
def test_emulator_primitive_contract(aws, mk):
    """The four-primitive contract, word for word the fake-backed one
    in test_cas_lock.py — moto arbitrates whether our fakes (and
    therefore our client code) read the service semantics right."""
    st = mk()
    assert st.get("k") is None
    assert st.put_if_absent("k", {"v": 1}) is True
    assert st.put_if_absent("k", {"v": 2}) is False  # create-exclusive
    assert st.get("k") == {"v": 1}
    assert st.delete_if_match("k", {"v": 2}) is False  # wrong expected
    assert st.get("k") == {"v": 1}
    assert st.delete_if_match("k", {"v": 1}) is True
    assert st.get("k") is None
    assert st.delete_if_match("k", {"v": 1}) is False  # already gone
    assert st.put_if_absent("k", {"v": 3}) is True  # re-creation works
    # the renewal primitive
    assert st.put_if_match("k", {"v": 9}, {"v": 4}) is False  # mismatch
    assert st.put_if_match("k", {"v": 3}, {"v": 4}) is True
    assert st.get("k") == {"v": 4}
    assert st.delete_if_match("k", {"v": 3}) is False  # old value dead
    assert st.delete_if_match("k", {"v": 4}) is True
    assert st.put_if_match("absent", {"v": 1}, {"v": 2}) is False


@pytest.mark.parametrize("mk", [_s3_store, lambda: _ddb_store()],
                         ids=["s3-moto", "ddb-moto"])
def test_emulator_steal_race_is_single_winner(aws, mk):
    st = mk()
    stale = {"owner": "dead", "expires_at": 0}
    assert st.put_if_absent("lease", stale)
    wins = [st.delete_if_match("lease", stale) for _ in range(2)]
    assert wins == [True, False]


@pytest.mark.parametrize("mk", [_s3_store, lambda: _ddb_store()],
                         ids=["s3-moto", "ddb-moto"])
def test_emulator_renew_vs_steal_is_single_winner(aws, mk):
    """Renewal (conditional replace of the old lease) vs steal
    (conditional delete of the old lease): after either wins, the
    other observes defeat — both orders."""
    st = mk()
    old = {"owner": "me", "expires_at": 1}
    new = {"owner": "me", "expires_at": 2}
    assert st.put_if_absent("lease", old)
    assert st.put_if_match("lease", old, new) is True  # renewal first
    assert st.delete_if_match("lease", old) is False   # stale steal loses
    assert st.delete_if_match("lease", new) is True    # fresh steal wins
    assert st.put_if_match("lease", new, old) is False  # renewal loses


@pytest.mark.parametrize("mk", [_s3_store, lambda: _ddb_store()],
                         ids=["s3-moto", "ddb-moto"])
def test_emulator_lock_provider_threads_lose_no_commit(aws, mk, tmp_path):
    """The manifest lost-update invariant through the real client code
    path over moto — commits, version claims, releases, the lot."""
    provider = CASLockProvider(mk())
    root = str(tmp_path / "ds")
    mf.commit(root, replace={"d": []}, lock=provider)
    errors: list[str] = []

    def adder(tid):
        try:
            for i in range(5):
                mf.commit(root, file_keys=[f"t{tid}-{i}"], lock=provider)
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=adder, args=(t,)) for t in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert mf.current(root)["version"] == 15
    assert len(mf.ingested_keys(root)) == 15
