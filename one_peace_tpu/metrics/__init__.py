from .metrics import MAP, Accuracy, IouAcc, MIoU, Recall  # noqa: F401
