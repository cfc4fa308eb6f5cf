from .test_mode import run_test_linear, run_test_probit
from .association import run_association_test
from .predict import run_predict

__all__ = ["run_test_linear", "run_test_probit", "run_association_test", "run_predict"]
