"""Filter-and-assign mode (placeholder — full implementation follows the
abundance path; reference: src/main.cpp:720-1016 filterAndAssignBatch)."""


def run_filter_and_assign(cfg, midx):
    raise NotImplementedError("--filter-and-assign lands with the next milestone")
