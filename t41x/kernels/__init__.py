from t41x.kernels.os_filter_pallas import os_filter_matmul_pallas  # noqa: F401
