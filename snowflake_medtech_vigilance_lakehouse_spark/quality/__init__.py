"""Declarative data-quality runner (dbt schema-test analog)."""

from .dq import Check, run_checks, assert_checks, MAUDE_STG_CHECKS, MAUDE_FACT_CHECKS  # noqa: F401
