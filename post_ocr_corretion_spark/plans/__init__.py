"""Plan-inspection helpers: assert the physical plans we ship are the
plans we want (pushdown, pruning, broadcast) — see PLANS.md."""
