from .metrics import MAP, Accuracy, IouAcc, Recall  # noqa: F401
