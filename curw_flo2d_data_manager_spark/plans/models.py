"""Per-model FLO-2D constants, externalized from the reference code.

Every literal here is workload configuration the reference hard-codes
inline; keeping them in one versioned table makes the plans pure
functions of (store, model, window).

Sources (reference file:line):

* inflow header constants — input/inflow/gen_150_inflow.py:102-104
  (``0/41550``), gen_150_v2_inflow.py:102-104 (``0/37814``),
  gen_250_inflow.py:122-126 (``0/0``, ``C 0 8655``) + reservoir rows
  :133-134 (cells 2265/3559, fixed 6.6 tail stage)
* outflow boundary cells — gen_outflow.py:128-151 (250),
  :177-198 (150), :226-247 (150_v2)
* raincell timestep / water-supply — gen_raincell.py:117-122
* rain resample step — input/rain/gen_rain.py:157-163
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ModelSpec:
    name: str
    # INFLOW.DAT header: (first line 2nd field, C-row 2nd field).
    # None → the model has no inflow spec (the open-ended flo2d_10
    # family is rain-only in the reference); inflow/outflow plans must
    # call require_inflow()/require_outflow() instead of reading the
    # fields raw, so a rain-only model raises instead of silently
    # rendering wrong headers (round-3 advice).
    inflow_header_cell: int | None
    inflow_c_cell: int | None

    def require_inflow(self) -> tuple[int, int]:
        if self.inflow_header_cell is None or self.inflow_c_cell is None:
            raise KeyError(
                f"{self.name}: no INFLOW spec — the flo2d_10 family is "
                "rain-only in the reference (gen_rain.py accepts any "
                "flo2d_10_* name; gen_inflow/gen_outflow do not)"
            )
        return self.inflow_header_cell, self.inflow_c_cell

    def require_outflow(self) -> tuple[tuple, tuple]:
        if not self.outflow_k_cells and not self.outflow_n_cells:
            raise KeyError(
                f"{self.name}: no OUTFLOW spec — the flo2d_10 family is "
                "rain-only in the reference"
            )
        return self.outflow_k_cells, self.outflow_n_cells
    # 250-only trailing reservoir rows: [(cell, fixed_stage | None)]
    # None stage → filled with the observed water level at run time
    reservoir_rows: tuple = ()
    # OUTFLOW.DAT: K cells then N boundary cells (order = file order)
    outflow_k_cells: tuple = ()
    outflow_n_cells: tuple = ()
    # timestep minutes + raincell water-supply correction per step
    timestep_min: int = 5
    water_supply: float = 1.0 / (24 * 12)
    rain_resample_min: int | None = None  # None → no resample


MODELS: dict[str, ModelSpec] = {
    "flo2d_250": ModelSpec(
        name="flo2d_250",
        inflow_header_cell=0,
        inflow_c_cell=8655,
        reservoir_rows=((2265, None), (3559, 6.6)),
        outflow_k_cells=(91, 171, 214, 491),
        outflow_n_cells=(134, 220, 261, 558),
        timestep_min=5,
        water_supply=1.0 / (24 * 12),
        rain_resample_min=None,
    ),
    "flo2d_150": ModelSpec(
        name="flo2d_150",
        inflow_header_cell=41550,
        inflow_c_cell=41550,
        outflow_k_cells=(290, 416, 488, 1218),
        outflow_n_cells=(356, 497, 568, 1330),
        timestep_min=15,
        water_supply=1.0 / (24 * 4),
        rain_resample_min=15,
    ),
    "flo2d_150_v2": ModelSpec(
        name="flo2d_150_v2",
        inflow_header_cell=37814,
        inflow_c_cell=37814,
        outflow_k_cells=(268, 391, 464, 1174),
        outflow_n_cells=(330, 462, 546, 1282),
        timestep_min=15,
        water_supply=1.0 / (24 * 4),
        rain_resample_min=15,
    ),
}

# The flo2d_10 family is open-ended: any model matching this pattern
# (one sub-catchment per config key, e.g. ``flo2d_10_Blomandl``) shares
# one rain spec — 5-minute grid, no resample (input/rain/gen_rain.py:
# 87,155-163: the non-250/150 branch takes timestep 5, and only
# timestep 15 resamples), gauge resolved by nearest station rather than
# an explicit grid id (:119-135,306-314).
FLO2D_10_PATTERN = re.compile(r"flo2d_10_.+")


def get_model_spec(model: str) -> ModelSpec:
    """Resolve a model name to its spec, admitting the open-ended
    flo2d_10 family (reference accepts any ``flo2d_10_*`` name,
    gen_rain.py:271-273)."""
    if model in MODELS:
        return MODELS[model]
    if FLO2D_10_PATTERN.match(model):
        # Rain-only spec: inflow cells stay None so inflow_lines /
        # outflow on a flo2d_10 model raise (via require_inflow /
        # require_outflow) as the reference's MODEL-keyed dict lookup
        # would, instead of rendering fabricated headers.
        return ModelSpec(
            name=model,
            inflow_header_cell=None,
            inflow_c_cell=None,
            timestep_min=5,
            water_supply=1.0 / (24 * 12),
            rain_resample_min=None,
        )
    raise KeyError(
        f"model should be one of {sorted(MODELS)} or match 'flo2d_10_*' "
        f"(got {model!r})"
    )


# Hard floor on raincell start time (reference: gen_raincell.py:110).
RAINCELL_MIN_START = "2019-06-28 00:00:00"

# Sentinel for tide gaps — rows dropped at ingest
# (reference: gen_outflow.py:109).
TIDE_GAP_SENTINEL = -99999.0
