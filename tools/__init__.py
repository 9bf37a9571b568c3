"""Verification tooling (tools.verify_oracle doubles as the
normalize() implementation the pytest oracle suite imports, so the
two comparators cannot drift)."""
