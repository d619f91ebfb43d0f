"""Injectable control-plane client: the boto3 seam for C1-C6.

The reference's control plane is five CloudWatch Logs API calls
(subscriber.js:12-65): describeLogGroups (paged, limit 50),
describeSubscriptionFilters, putSubscriptionFilter,
deleteSubscriptionFilter, putRetentionPolicy. `control.py` implements
the same SEMANTICS against the local filesystem/registry; this module
adds the missing seam — the control flow (paging recursion, the
put-then-upsert-on-conflict fallback, the delete+re-put replace) runs
against an injected CLIENT with boto3-shaped request/response dicts,
so swapping in `boto3.client("logs")` is a constructor change, not a
rewrite:

- :class:`LocalLogsClient` — the default: log groups are directories,
  filters live in the JSON registry, retention is recorded per group.
- :class:`Boto3LogsClient` — the thin AWS passthrough (import-guarded;
  no network in this sandbox, so it is exercised only to the
  constructor seam).
- :func:`process_all` — the subscriber handler's whole flow
  (subscriber.js:75-97): page through groups, cycle-guard, subscribe
  each with the upsert fallback, set retention.

One deliberate behavior fix over the reference: `upsertSubscription
Filter` dereferences `subscriptionFilters[0]` unguarded
(subscriber.js:38) and CRASHES when a put failed for a reason other
than an existing filter (empty list). Here an empty list retries the
put once and surfaces the real error instead.
"""

from __future__ import annotations

import json
import os


class SubscriptionConflict(Exception):
    """put_subscription_filter refused: the group already carries a
    different filter (the AWS LimitExceeded/ResourceAlreadyExists
    class of errors the reference's try/catch routes to the upsert)."""


class LogsControlClient:
    """The wire-shaped interface (boto3 `logs` client subset). All
    request/response payloads are the AWS dict shapes."""

    def describe_log_groups(
        self, prefix: str, limit: int = 50, next_token=None
    ) -> dict:
        raise NotImplementedError

    def describe_subscription_filters(self, log_group: str) -> dict:
        raise NotImplementedError

    def put_subscription_filter(self, options: dict) -> None:
        raise NotImplementedError

    def delete_subscription_filter(
        self, filter_name: str, log_group: str
    ) -> None:
        raise NotImplementedError

    def put_retention_policy(self, log_group: str, days: int) -> None:
        raise NotImplementedError


class LocalLogsClient(LogsControlClient):
    """Filesystem/registry-backed client with faithful API semantics:
    directories under ``base_dir`` are log groups; one subscription
    filter per group (putting a DIFFERENT name raises
    SubscriptionConflict — same name updates the pattern, like AWS);
    retention days land in the registry beside the filters."""

    def __init__(self, base_dir: str, registry_path: str):
        self.base_dir = base_dir
        self.registry_path = registry_path
        self._state: dict = {"filters": {}, "retention": {}}
        if os.path.exists(registry_path):
            with open(registry_path) as f:
                self._state = json.load(f)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.registry_path) or ".", exist_ok=True)
        tmp = self.registry_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f, indent=2, sort_keys=True)
        os.replace(tmp, self.registry_path)

    def _all_groups(self, prefix: str) -> list[str]:
        out = []
        for root, dirs, _files in os.walk(self.base_dir):
            for d in sorted(dirs):
                full = os.path.join(root, d)
                rel = os.path.relpath(full, self.base_dir)
                if rel.startswith(prefix) and not any(
                    os.path.isdir(os.path.join(full, s))
                    for s in os.listdir(full)
                ):
                    out.append(rel)
        return sorted(out)

    def describe_log_groups(
        self, prefix: str, limit: int = 50, next_token=None
    ) -> dict:
        groups = self._all_groups(prefix)
        start = int(next_token) if next_token else 0
        page = groups[start : start + limit]
        res = {"logGroups": [{"logGroupName": g} for g in page]}
        if start + limit < len(groups):
            res["nextToken"] = str(start + limit)
        return res

    def describe_subscription_filters(self, log_group: str) -> dict:
        f = self._state["filters"].get(log_group)
        return {"subscriptionFilters": [dict(f)] if f else []}

    def put_subscription_filter(self, options: dict) -> None:
        group = options["logGroupName"]
        cur = self._state["filters"].get(group)
        if cur and cur["filterName"] != options["filterName"]:
            # one filter per group: a different name must delete first
            raise SubscriptionConflict(
                f"{group} already has filter {cur['filterName']!r}"
            )
        self._state["filters"][group] = {
            "filterName": options["filterName"],
            "filterPattern": options.get("filterPattern", ""),
            "destinationArn": options.get("destinationArn", ""),
            "distribution": options.get("distribution", "ByLogStream"),
        }
        self._save()

    def delete_subscription_filter(
        self, filter_name: str, log_group: str
    ) -> None:
        cur = self._state["filters"].get(log_group)
        if not cur or cur["filterName"] != filter_name:
            raise KeyError(f"no filter {filter_name!r} on {log_group}")
        del self._state["filters"][log_group]
        self._save()

    def put_retention_policy(self, log_group: str, days: int) -> None:
        self._state["retention"][log_group] = int(days)
        self._save()


class Boto3LogsClient(LogsControlClient):
    """Thin passthrough to ``boto3.client("logs")`` — the production
    drop-in. Constructed lazily so environments without boto3 (this
    sandbox) fail only when actually selected."""

    def __init__(self, region: str | None = None):
        try:
            import boto3  # type: ignore
        except ImportError as e:  # pragma: no cover - no boto3 here
            raise ImportError(
                "Boto3LogsClient requires boto3; use LocalLogsClient in "
                "environments without AWS access"
            ) from e
        self._c = boto3.client("logs", region_name=region)

    def describe_log_groups(self, prefix, limit=50, next_token=None):
        req = {"logGroupNamePrefix": prefix, "limit": limit}
        if next_token:
            req["nextToken"] = next_token
        return self._c.describe_log_groups(**req)

    def describe_subscription_filters(self, log_group):
        return self._c.describe_subscription_filters(logGroupName=log_group)

    def put_subscription_filter(self, options):
        try:
            self._c.put_subscription_filter(
                destinationArn=options["destinationArn"],
                logGroupName=options["logGroupName"],
                filterName=options["filterName"],
                filterPattern=options.get("filterPattern", ""),
                roleArn=options.get("roleArn", ""),
                distribution=options.get("distribution", "ByLogStream"),
            )
        except Exception as e:  # normalize to the seam's conflict type
            raise SubscriptionConflict(str(e)) from e

    def delete_subscription_filter(self, filter_name, log_group):
        self._c.delete_subscription_filter(
            filterName=filter_name, logGroupName=log_group
        )

    def put_retention_policy(self, log_group, days):
        self._c.put_retention_policy(
            logGroupName=log_group, retentionInDays=days
        )


def list_log_groups(
    client: LogsControlClient, prefix: str, limit: int = 50
) -> list[str]:
    """The recursive nextToken accumulation loop (subscriber.js:18-31),
    iterative here."""
    acc: list[str] = []
    token = None
    while True:
        res = client.describe_log_groups(prefix, limit, token)
        acc.extend(g["logGroupName"] for g in res["logGroups"])
        token = res.get("nextToken")
        if not token:
            return acc


def upsert_subscription_filter(
    client: LogsControlClient, options: dict
) -> str:
    """deleteSubscriptionFilter + putSubscriptionFilter when the
    existing filter differs (subscriber.js:33-46) — with the empty-
    `subscriptionFilters` guard the reference lacks: if no filter
    exists, the original put failed for some OTHER reason; retry it
    once so the real error surfaces instead of an IndexError."""
    subs = client.describe_subscription_filters(options["logGroupName"])[
        "subscriptionFilters"
    ]
    if not subs:
        client.put_subscription_filter(options)
        return "created"
    cur = subs[0]
    if (
        cur["filterName"] != options["filterName"]
        or cur["filterPattern"] != options.get("filterPattern", "")
    ):
        client.delete_subscription_filter(
            cur["filterName"], options["logGroupName"]
        )
        client.put_subscription_filter(options)
        return "replaced"
    return "unchanged"


def subscribe(client: LogsControlClient, options: dict) -> str:
    """put, falling back to the upsert on conflict (subscriber.js:
    48-65 try/catch)."""
    try:
        client.put_subscription_filter(options)
        return "created"
    except SubscriptionConflict:
        return upsert_subscription_filter(client, options)


def process_all(
    client: LogsControlClient,
    prefix: str,
    own_name: str,
    filter_name: str,
    filter_pattern: str = "",
    destination_arn: str = "",
    role_arn: str = "",
    retention_days: int | None = None,
) -> dict:
    """The subscriber handler end-to-end (subscriber.js:75-97): page
    through log groups, drop the shipper's own group (cycle guard,
    subscriber.js:70-73), subscribe each, optionally set retention.
    Returns {"sources": [...], "results": {group: status}}."""
    # Cycle guard matches the group's BASENAME exactly — a suffix test
    # would also drop unrelated groups that merely end with own_name
    # (own_name 'shipper' must not exclude 'other-shipper').
    groups = [
        g
        for g in list_log_groups(client, prefix)
        if os.path.basename(g.rstrip("/")) != own_name
    ]
    results: dict[str, str] = {}
    for g in groups:
        options = {
            "destinationArn": destination_arn,
            "logGroupName": g,
            "filterName": filter_name,
            "filterPattern": filter_pattern,
            "roleArn": role_arn,
            "distribution": "ByLogStream",  # subscriber.js:55
        }
        results[g] = subscribe(client, options)
        if retention_days is not None:
            client.put_retention_policy(g, retention_days)
    return {"sources": groups, "results": results}
