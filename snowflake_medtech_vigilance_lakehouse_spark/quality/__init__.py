"""Declarative data-quality runner (dbt schema-test analog)."""

from .dq import Check, run_checks, assert_checks, MAUDE_STG_CHECKS, MAUDE_FACT_CHECKS  # noqa: F401
from .policies import MaskingRule, apply_policies, sha2_pseudonymize, partial_mask  # noqa: F401
from .costs import cost_report  # noqa: F401
