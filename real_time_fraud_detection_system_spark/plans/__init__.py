"""Plan inspection: assertions over the physical plan (pushdown,
broadcast, codegen) used by tests and the perf checklist.
"""
