"""Composable DataFrame operators (relational + training-data ops)."""
