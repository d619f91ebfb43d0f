"""Shared logical-plan walkers for the plan-shape tests (one detector,
two consumers — tests/test_plan_audit_r15.py and tests/test_ranking.py
— so the global-window definition cannot drift between them)."""

from __future__ import annotations

_BOUNDING = {"GlobalLimit", "LocalLimit", "LocalRelation", "OneRowRelation"}


def walk(jnode):
    stack = [jnode]
    while stack:
        node = stack.pop()
        yield node
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))


def is_global_window(node) -> bool:
    """Window with no REAL partition key: empty spec, or a spec the
    optimizer could fold to a constant (constant keys put everything
    in one partition — same physical shape as no key at all)."""
    if node.nodeName() != "Window":
        return False
    spec = node.partitionSpec()
    return spec.size() == 0 or all(
        spec.apply(i).foldable() for i in range(spec.size())
    )


def input_bounded(node) -> bool:
    """True only when EVERY row path into ``node`` flows through a
    limit / literal relation. A limit on ONE side of a join must not
    bless the other side (the fact table still moves through one task
    — the bypass a subtree-scan rule would allow), so multi-child
    nodes require ALL children bounded; single-child nodes pass
    through; leaves that are not literal relations are unbounded."""
    if node.nodeName() in _BOUNDING:
        return True
    kids = node.children()
    n = kids.size()
    if n == 0:
        return False
    return all(input_bounded(kids.apply(i)) for i in range(n))


def global_windows_over_unbounded(jplan) -> list[str]:
    return [
        w.simpleString(60)
        for w in walk(jplan)
        if is_global_window(w) and not input_bounded(w.child())
    ]


def global_windows(jplan) -> list[str]:
    return [w.simpleString(60) for w in walk(jplan) if is_global_window(w)]
