"""Scalar function library: PII masking (A23), partition-bucket
derivations (A9), text analysis, vector math. All Catalyst built-ins or
compositions thereof — no row-at-a-time Python."""
