from t41x.dsp import firdesign  # noqa: F401
