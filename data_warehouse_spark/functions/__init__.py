from .coercions import status_code, status_name, to_money, money_cents  # noqa: F401
