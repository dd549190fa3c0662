"""Stage plan builders: validate → index → resolve."""
