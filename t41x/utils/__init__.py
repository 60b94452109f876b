from t41x.utils import windows  # noqa: F401
