"""Colored console prefixes (tools/utils.py:15-17 UX parity)."""

INFO = "\033[94m[ INFO  ]\033[0m"
ERROR = "\033[91m[ ERROR ]\033[0m"
NOTE = "\033[92m[ NOTE ]\033[0m"
