"""Control-plane client seam: boto3-shaped paging/subscribe/upsert/
retention flow against the local client and a scripted fake — incl.
the empty-subscriptionFilters guard the reference lacks
(subscriber.js:38 unguarded [0])."""

from __future__ import annotations

import os

import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.control_client import (
    LocalLogsClient,
    LogsControlClient,
    SubscriptionConflict,
    list_log_groups,
    process_all,
    subscribe,
    upsert_subscription_filter,
)


def _mk_groups(base, names):
    for n in names:
        os.makedirs(os.path.join(base, n), exist_ok=True)


@pytest.fixture()
def env(tmp_path):
    base = str(tmp_path / "groups")
    _mk_groups(
        base,
        [f"aws/lambda/fn{i:03d}" for i in range(120)] + ["other/x"],
    )
    return base, str(tmp_path / "registry.json")


def test_paged_listing_accumulates_all_pages(env):
    base, reg = env
    c = LocalLogsClient(base, reg)
    # limit 50 (subscriber.js:20): 120 groups -> 3 pages via nextToken
    page1 = c.describe_log_groups("aws/lambda", limit=50)
    assert len(page1["logGroups"]) == 50 and "nextToken" in page1
    got = list_log_groups(c, "aws/lambda", limit=50)
    assert len(got) == 120
    assert all(g.startswith("aws/lambda/") for g in got)
    assert list_log_groups(c, "other") == ["other/x"]


def test_subscribe_upsert_and_retention_flow(env):
    base, reg = env
    c = LocalLogsClient(base, reg)
    out = process_all(
        c,
        prefix="aws/lambda",
        own_name="fn000",  # cycle guard drops the shipper itself
        filter_name="shipper",
        filter_pattern="",
        retention_days=1,
    )
    assert "aws/lambda/fn000" not in out["sources"]
    assert len(out["sources"]) == 119
    assert set(out["results"].values()) == {"created"}
    # idempotent second run: the same-name put overwrites in place (AWS
    # putSubscriptionFilter semantics — success, not a conflict), and
    # the registry content is unchanged
    before = dict(c._state["filters"])
    out2 = process_all(
        c, "aws/lambda", "fn000", "shipper", "", retention_days=1
    )
    assert set(out2["results"].values()) == {"created"}
    assert c._state["filters"] == before
    # changed pattern: conflictless same-name update -> created (AWS
    # putSubscriptionFilter with the same name overwrites in place)
    st = subscribe(
        c,
        {
            "logGroupName": "aws/lambda/fn001",
            "filterName": "shipper",
            "filterPattern": "[new]",
        },
    )
    assert st == "created"
    # different NAME conflicts -> delete + re-put = replaced
    st = subscribe(
        c,
        {
            "logGroupName": "aws/lambda/fn001",
            "filterName": "shipper-v2",
            "filterPattern": "[new]",
        },
    )
    assert st == "replaced"
    subs = c.describe_subscription_filters("aws/lambda/fn001")
    assert subs["subscriptionFilters"][0]["filterName"] == "shipper-v2"
    # registry persists across client instances
    c2 = LocalLogsClient(base, reg)
    assert (
        c2.describe_subscription_filters("aws/lambda/fn001")[
            "subscriptionFilters"
        ][0]["filterName"]
        == "shipper-v2"
    )
    assert c2._state["retention"]["aws/lambda/fn002"] == 1


class _FlakyPutClient(LogsControlClient):
    """put fails with a conflict although NO filter exists — the case
    where the reference's upsert crashes on subscriptionFilters[0]."""

    def __init__(self):
        self.puts = 0
        self.filters: dict[str, dict] = {}

    def describe_subscription_filters(self, log_group):
        f = self.filters.get(log_group)
        return {"subscriptionFilters": [f] if f else []}

    def put_subscription_filter(self, options):
        self.puts += 1
        if self.puts == 1:
            raise SubscriptionConflict("transient limit error")
        self.filters[options["logGroupName"]] = {
            "filterName": options["filterName"],
            "filterPattern": options.get("filterPattern", ""),
        }

    def delete_subscription_filter(self, filter_name, log_group):
        del self.filters[log_group]


def test_upsert_guards_empty_filter_list():
    c = _FlakyPutClient()
    st = subscribe(
        c, {"logGroupName": "g", "filterName": "f", "filterPattern": ""}
    )
    # reference: IndexError here; seam: retries the put and succeeds
    assert st == "created"
    assert c.filters["g"]["filterName"] == "f"


def test_upsert_replaces_differing_filter():
    c = _FlakyPutClient()
    c.puts = 5  # no injected failure
    c.filters["g"] = {"filterName": "old", "filterPattern": "[x]"}
    st = upsert_subscription_filter(
        c, {"logGroupName": "g", "filterName": "new", "filterPattern": ""}
    )
    assert st == "replaced"
    assert c.filters["g"]["filterName"] == "new"
    # identical filter: no-op
    st = upsert_subscription_filter(
        c, {"logGroupName": "g", "filterName": "new", "filterPattern": ""}
    )
    assert st == "unchanged"


def test_boto3_client_import_guard():
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.control_client import (
        Boto3LogsClient,
    )

    try:
        import boto3  # noqa: F401

        pytest.skip("boto3 present; passthrough construction untested here")
    except ImportError:
        with pytest.raises(ImportError):
            Boto3LogsClient()
