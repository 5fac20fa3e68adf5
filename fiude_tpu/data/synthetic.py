"""Synthetic influenza-surveillance data with the reference's schemas.

The reference's ``Data/`` directory is gitignored and absent, so the
framework ships a generator that fabricates epidemiologically-plausible data
two ways:

* :func:`synthetic_dataset` — in-memory windowed training arrays shaped
  exactly like ``DataConstructor.__call__`` output (reference
  ``lib/regional_data_builder.py:162-274``) for tests and benchmarks;
* :func:`write_reference_data_tree` — a fake ``Data/`` tree (national/hhs/
  state ILI CSVs, per-state query CSVs, population, similarity scores,
  season dates) with faithful column/index schemas reconstructed from the
  reference loaders, so the full :class:`~fiude_tpu.data.builder.
  DataConstructor` pipeline can run end-to-end.

Epidemic curves come from actual SIR integrations (seasonally re-seeded,
noise-perturbed), so models trained on this data learn real mechanistic
structure — not arbitrary noise.
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Dict, Optional, Tuple

import numpy as np

US_STATE_CODES = [
    'AK', 'AL', 'AR', 'AZ', 'CA', 'CO', 'CT', 'DE', 'DC', 'GA', 'HI', 'ID',
    'IL', 'IN', 'IA', 'KS', 'KY', 'LA', 'ME', 'MD', 'MI', 'MN', 'MS', 'MO',
    'MT', 'NE', 'NV', 'NH', 'NJ', 'NM', 'NY', 'NC', 'ND', 'OH', 'OK', 'OR',
    'PA', 'RI', 'SC', 'SD', 'TN', 'TX', 'UT', 'VT', 'VA', 'WA', 'WV', 'WI',
    'WY']
US_STATE_NAMES = [
    'Alaska', 'Alabama', 'Arkansas', 'Arizona', 'California', 'Colorado',
    'Connecticut', 'Delaware', 'District of Columbia', 'Georgia', 'Hawaii',
    'Idaho', 'Illinois', 'Indiana', 'Iowa', 'Kansas', 'Kentucky', 'Louisiana',
    'Maine', 'Maryland', 'Michigan', 'Minnesota', 'Mississippi', 'Missouri',
    'Montana', 'Nebraska', 'Nevada', 'New Hampshire', 'New Jersey',
    'New Mexico', 'New York', 'North Carolina', 'North Dakota', 'Ohio',
    'Oklahoma', 'Oregon', 'Pennsylvania', 'Rhode Island', 'South Carolina',
    'South Dakota', 'Tennessee', 'Texas', 'Utah', 'Vermont', 'Virginia',
    'Washington', 'West Virginia', 'Wisconsin', 'Wyoming']


def _sir_season(rng: np.random.Generator, n_days: int, beta: float,
                gamma: float, i0: float) -> np.ndarray:
    """Euler-integrated daily SIR infectious curve over one season (in weeks
    time units to match the model's t convention)."""
    s, i = 1.0 - i0, i0
    out = np.empty(n_days)
    dt_w = 1.0 / 7.0
    for d in range(n_days):
        out[d] = i
        ds = -beta * s * i
        di = beta * s * i - gamma * i
        s += ds * dt_w
        i += di * dt_w
    return out


def synthetic_daily_ili(
    n_regions: int,
    n_seasons: int = 6,
    season_len: int = 365,
    seed: int = 0,
    peak_scale: float = 7.7,
    season_coherence: float = 0.8,
) -> np.ndarray:
    """Daily ILI-rate curves (n_days, n_regions), peaks O(1-8) like CDC data.

    ``season_coherence`` in [0, 1] sets how strongly regions share each
    season's epidemic: real ILI surveillance co-moves across regions within
    a season (one dominant strain nationally — the property the reference's
    multi-region hhs/state results ride on), so each season draws shared
    (beta, gamma, i0, onset) "strain" parameters and each region perturbs
    them; at 0 every region draws its own season independently
    (distributionally equivalent to the pre-round-3 behavior — the loop
    order changed, so the same seed does NOT reproduce pre-round-3 trees
    bit-for-bit — which made the synthetic hhs task strictly harder
    than the real data: 10 nearly-independent processes for one shared
    encoder — see docs/RESULTS_SYNTH.md).
    """
    rng = np.random.default_rng(seed)
    n_days = n_seasons * season_len
    ili = np.zeros((n_days, n_regions))
    c = float(np.clip(season_coherence, 0.0, 1.0))
    for s in range(n_seasons):
        beta_s = rng.uniform(0.7, 1.1)
        gam_s = rng.uniform(0.45, 0.6)
        i0_s = rng.uniform(5e-4, 3e-3)
        onset_s = rng.uniform(0.1, 0.35)
        for r in range(n_regions):
            beta = c * beta_s + (1 - c) * rng.uniform(0.7, 1.1) \
                + c * rng.normal(0.0, 0.03)
            gam = c * gam_s + (1 - c) * rng.uniform(0.45, 0.6) \
                + c * rng.normal(0.0, 0.015)
            i0 = c * i0_s + (1 - c) * rng.uniform(5e-4, 3e-3)
            i0 *= np.exp(c * rng.normal(0.0, 0.3))
            onset_f = c * onset_s + (1 - c) * rng.uniform(0.1, 0.35) \
                + c * rng.normal(0.0, 0.02)
            onset = int(np.clip(onset_f, 0.05, 0.5) * season_len)
            curve = _sir_season(rng, season_len, beta, gam, i0)
            seasonal = np.zeros(season_len)
            seasonal[onset:] = curve[: season_len - onset]
            ili[s * season_len:(s + 1) * season_len, r] += seasonal
    ili = ili / max(ili.max(), 1e-9) * peak_scale
    ili += np.abs(rng.normal(0.0, 0.02 * peak_scale, ili.shape))
    # weekly reporting smoothness
    kernel = np.ones(7) / 7.0
    for r in range(n_regions):
        ili[:, r] = np.convolve(ili[:, r], kernel, mode="same")
    return ili


def synthetic_queries(ili: np.ndarray, n_qs: int, seed: int = 0) -> np.ndarray:
    """Query time-series (n_days, n_regions, n_qs): lagged/saturated noisy
    transforms of ILI — informative like real search data."""
    rng = np.random.default_rng(seed + 1)
    n_days, n_regions = ili.shape
    qs = np.zeros((n_days, n_regions, n_qs))
    for r in range(n_regions):
        base = ili[:, r] / max(ili[:, r].max(), 1e-9)
        for q in range(n_qs):
            lag = rng.integers(-10, 3)
            shifted = np.roll(base, lag)
            gain = rng.uniform(0.4, 1.0)
            sat = rng.uniform(0.5, 2.0)
            noise = rng.normal(0, 0.05, n_days)
            qs[:, r, q] = np.clip(gain * shifted ** sat + noise, 0, None)
    qmax = qs.max(axis=0, keepdims=True)
    return qs / np.maximum(qmax, 1e-9)


def build_windows(
    qs_norm: np.ndarray,
    ili_norm: np.ndarray,
    *,
    window_size: int,
    gamma: int,
    lag: int = 14,
    run_backward: bool = True,
    no_qs_in_output: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sliding windows with the reference's exact layout
    (lib/regional_data_builder.py:219-251).

    Inputs: per step b, ``window_size + lag`` days of
    [region1 queries | region2 queries | ... | all-region ILI] with the
    trailing ``lag`` days of ILI masked to -1.
    Outputs: ILI over [lookback + horizon] when ``run_backward`` else horizon
    only.
    """
    n_days, n_regions, n_qs = qs_norm.shape
    inputs, outputs = [], []
    for b in range(window_size + 1, n_days - gamma):
        w_qs = qs_norm[b - window_size - 1: b + lag - 1]          # (W+lag, R, Q)
        w_ili = ili_norm[b - window_size - 1: b + lag - 1].copy()  # (W+lag, R)
        w_ili[-lag:, :] = -1.0
        # region-major query blocks like the reference's per-region concat
        feats = np.concatenate(
            [w_qs[:, r, :] for r in range(n_regions)] + [w_ili], axis=-1)

        if run_backward:
            o_ili = ili_norm[b - window_size - 1: b + gamma]
        else:
            o_ili = ili_norm[b: b + gamma]
        out = o_ili if no_qs_in_output else np.concatenate(
            [qs_norm[b: b + gamma, r, :] for r in range(n_regions)] + [o_ili],
            axis=-1)
        inputs.append(feats)
        outputs.append(out)
    return np.asarray(inputs, np.float32), np.asarray(outputs, np.float32)


def synthetic_dataset(
    *,
    n_regions: int = 1,
    n_qs: int = 4,
    window_size: int = 28,
    gamma: int = 28,
    lag: int = 14,
    n_seasons: int = 4,
    season_len: int = 200,
    train_frac: float = 0.8,
    run_backward: bool = True,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x_train, y_train, x_test, y_test, scaler) shaped like the reference
    DataConstructor output; scaler = ili.max() * 13 per region
    (lib/regional_data_builder.py:213)."""
    ili = synthetic_daily_ili(n_regions, n_seasons, season_len, seed)
    qs = synthetic_queries(ili, n_qs, seed)
    # the reference's scaler = ili.max()*13 un-does its /13 load scaling
    # (lib/regional_data_builder.py:140,213); synthetic curves are already in
    # raw wILI units, so the un-scaler is just the max
    scaler = ili.max(axis=0)
    ili_norm = ili / np.maximum(ili.max(axis=0, keepdims=True), 1e-9)
    from fiude_tpu.data.native import build_windows_fast
    x, y = build_windows_fast(qs, ili_norm, window_size=window_size,
                              gamma=gamma, lag=lag,
                              run_backward=run_backward)
    split = int(len(x) * train_frac)
    return (x[:split], y[:split], x[split:], y[split:],
            scaler.astype(np.float32))


# ---------------------------------------------------------------------------
# Fake Data/ tree with the reference's on-disk schemas
# ---------------------------------------------------------------------------

def write_reference_data_tree(root: str, *, n_qs: int = 12, seed: int = 0,
                              start: str = "2010-10-01",
                              n_weeks: int = 470) -> None:
    """Fabricate a ``Data/`` directory consumable by
    :class:`fiude_tpu.data.builder.DataConstructor`.

    Files & schemas (reconstructed from the reference loaders):
      - ``national_flu.csv`` — weekly national ILI, ``weighted_ili`` column,
        date index in the last column (``lib/regional_data_builder.py:128``)
      - ``hhs_flu.csv`` / ``state_flu.csv`` — long format rows
        (region, unweighted_ili, date) (``:129-135``)
      - ``Queries/US_query_data_all_smoothed.csv`` and
        ``Queries/state_queries/{CODE}_query_data.csv`` — daily query columns
      - ``state_population_data_2019.csv`` — CODE, POP (``:34``)
      - ``Similarity_Scores.csv`` — per-query semantic scores (``:107``)
      - ``Dates.csv`` — per-season train/test split dates (``:253``)
    """
    import pandas as pd

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "Queries", "state_queries"), exist_ok=True)

    start_date = dt.date.fromisoformat(start)
    week_dates = pd.to_datetime(
        [start_date + dt.timedelta(weeks=w) for w in range(n_weeks)])
    n_days = (week_dates[-1] - week_dates[0]).days + 1
    day_dates = pd.to_datetime(
        [week_dates[0] + dt.timedelta(days=d) for d in range(n_days)])

    n_states = len(US_STATE_CODES)
    season_len = 364
    n_seasons = n_days // season_len + 1
    state_ili = synthetic_daily_ili(n_states, n_seasons, season_len,
                                    seed)[:n_days]
    nat_ili = state_ili.mean(axis=1, keepdims=True)

    q_names = [f"query_{i}" for i in range(n_qs)]

    # national weekly ILI
    widx = [(d - day_dates[0]).days for d in week_dates]
    nat = pd.DataFrame({"weighted_ili": nat_ili[widx, 0]})
    nat["week"] = np.arange(n_weeks)
    nat["date"] = week_dates
    nat.to_csv(os.path.join(root, "national_flu.csv"), index=False)

    # hhs / state weekly ILI (long format)
    from fiude_tpu.data.regions import HHS_REGION_STATES
    hhs_rows, state_rows = [], []
    for w, d in zip(widx, week_dates):
        for i, name in enumerate(US_STATE_NAMES):
            state_rows.append((name, state_ili[w, i], d))
        for region_num, codes in HHS_REGION_STATES.items():
            members = [US_STATE_CODES.index(c) for c in codes
                       if c in US_STATE_CODES]
            hhs_rows.append((f"Region {region_num}",
                             state_ili[w, members].mean(), d))
    pd.DataFrame(hhs_rows, columns=["region", "unweighted_ili", "date"]).to_csv(
        os.path.join(root, "hhs_flu.csv"), index=False)
    pd.DataFrame(state_rows, columns=["region", "unweighted_ili", "date"]).to_csv(
        os.path.join(root, "state_flu.csv"), index=False)

    # per-state daily queries (FL has a query file + population in the
    # reference even though the 49-state ILI table omits it — HHS Region 4
    # aggregation reads it, lib/regional_data_builder.py:38,49-53)
    query_codes = US_STATE_CODES + ["FL"]
    for i, code in enumerate(query_codes):
        col = state_ili[:, i:i + 1] if i < n_states else state_ili[:, 9:10]
        qs = synthetic_queries(col, n_qs, seed + i)[:, 0, :]
        df = pd.DataFrame(qs * 100.0, index=day_dates, columns=q_names)
        df.to_csv(os.path.join(root, "Queries", "state_queries",
                               f"{code}_query_data.csv"))

    # national daily queries
    qs = synthetic_queries(nat_ili, n_qs, seed + 999)[:, 0, :]
    pd.DataFrame(qs * 100.0, index=day_dates, columns=q_names).to_csv(
        os.path.join(root, "Queries", "US_query_data_all_smoothed.csv"))

    # population
    pops = rng.integers(500_000, 40_000_000, len(query_codes))
    pd.DataFrame({"CODE": query_codes, "POP": pops}).to_csv(
        os.path.join(root, "state_population_data_2019.csv"))

    # similarity scores
    pd.DataFrame({"similarity": rng.uniform(0.3, 1.0, n_qs)},
                 index=q_names).to_csv(os.path.join(root, "Similarity_Scores.csv"))

    # season split dates
    first_year = week_dates[0].year
    rows = []
    for season in range(first_year + 2, week_dates[-1].year):
        rows.append({
            "season": season,
            "train_start": f"{first_year}-11-01",
            "train_end": f"{season}-08-01",
            "test_start": f"{season}-10-01",
            "test_end": f"{season + 1}-05-01",
        })
    pd.DataFrame(rows).set_index("season").to_csv(os.path.join(root, "Dates.csv"))


def write_legacy_national_tree(root: str, *, n_qs: int = 6,
                               seed: int = 0) -> None:
    """Fabricate the files the legacy national pipeline reads
    (:mod:`fiude_tpu.data.legacy`, reference ``lib/Old/data.py:15-74``):

      - ``national_flu.csv`` — weekly US ILI from 1997 (the reference skips
        the first 300 rows, ``:66``); Sunday-dated so the +3-day shift lands
        on the Wednesday season anchors
      - ``ILI_rates_{UK,US}_thursday_cubic_interpolation.csv`` — daily
        national ILI, ``wILI`` column
      - ``{UK,US}_Qs_small_7day_avg.csv`` — daily national query columns
      - ``{UK,US}_Similarity_Scores.csv`` — per-query semantic scores
    """
    import pandas as pd

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    q_names = [f"query_{i}" for i in range(n_qs)]

    # weekly US ILI, Sundays 1997-01-05 .. 2017-07
    week_dates = pd.date_range("1997-01-05", "2017-07-30", freq="7D")
    n_seasons = len(week_dates) // 52 + 1
    daily_curve = synthetic_daily_ili(1, n_seasons, 364, seed)[:, 0]
    widx = [(d - week_dates[0]).days for d in week_dates]
    nat = pd.DataFrame({"weighted_ili": daily_curve[widx]})
    nat["week"] = np.arange(len(week_dates))
    nat["date"] = week_dates
    nat.to_csv(os.path.join(root, "national_flu.csv"), index=False)

    # daily national ILI + queries per country, Sundays-aligned start
    day_dates = pd.date_range("2003-06-01", "2017-06-30", freq="D")
    for code, shift in (("UK", 0), ("US", 1)):
        curve = synthetic_daily_ili(1, len(day_dates) // 364 + 1, 364,
                                    seed + shift)[: len(day_dates), 0]
        pd.DataFrame({"wILI": curve}, index=day_dates).to_csv(
            os.path.join(root,
                         f"ILI_rates_{code}_thursday_cubic_interpolation.csv"))
        qs = synthetic_queries(curve[:, None], n_qs, seed + 10 + shift)[:, 0, :]
        pd.DataFrame(qs * 100.0, index=day_dates, columns=q_names).to_csv(
            os.path.join(root, f"{code}_Qs_small_7day_avg.csv"))
        pd.DataFrame({"similarity": rng.uniform(0.3, 1.0, n_qs)},
                     index=q_names).to_csv(
            os.path.join(root, f"{code}_Similarity_Scores.csv"))
