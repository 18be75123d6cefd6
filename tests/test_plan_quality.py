"""Physical-plan regression gate: the scale-critical plan properties
(pushdown, pruning, broadcast, group-limit, agg phases) assert against
explain(formatted) output — a slow-plan regression fails CI, not a 100 TB
run. Rules live in scripts/audit_plans.py (also runnable standalone)."""

import sys

import pytest

from scripts.audit_plans import RULES, plan_of

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def plans(spark, sf001):
    qs = entry_mod.queries()
    out = {}
    for qname, _rule, _pred in RULES:
        if qname not in out:
            out[qname] = plan_of(qs[qname](spark, sf001))
    return out


@pytest.mark.parametrize(
    "qname,rule,pred", RULES, ids=[f"{q}::{r[:40]}" for q, r, _ in RULES]
)
def test_plan_rule(plans, qname, rule, pred):
    plan = plans[qname]
    assert pred(plan), f"{qname}: {rule}\n--- plan ---\n{plan[:4000]}"
