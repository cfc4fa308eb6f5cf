from .data_sim import simulate_iid, write_fixture

__all__ = ["simulate_iid", "write_fixture"]
