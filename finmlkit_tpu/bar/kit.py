"""User-facing bar builder kits (pandas in / pandas out).

Parity: /root/reference/finmlkit/bar/kit.py + the BarBuilderBase template
at bar/base.py:24-300. The kits are thin hosts around the jitted TPU
kernels in ``indexers`` / ``aggregate`` / ``footprint``. Shapes are
bucketed (padded to power-of-two sizes) so the XLA compile cache stays
small across months of differing trade counts; padded trailing bars are
empty by construction and sliced off before building DataFrames.

Fast-path dispatch: on a TPU backend with quantizable trades, OHLCV and
directional products come from the fused single-pass Pallas pipeline
(bar/fused.py — one scan computes both product families; medians run
in native host code overlapped with the device work), and trade-size
features from the fused native host kernel. The staged aggregate /
aggregate_q paths remain the CPU and non-quantizable fallbacks. The
``FMKT_FUSED`` env var overrides dispatch: "auto" (default),
"force"/"interpret" (always use it — interpret runs the Pallas kernel
in interpreter mode for CPU tests), or "off".
"""
import os
from abc import ABC, abstractmethod
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ops.pallas_scan import _runs_on_tpu
from ..ops.scan import next_bucket
from ..utils.log import get_logger
from . import aggregate, aggregate_q, fused as fused_mod, indexers
from .data_model import FootprintData, TradesData, comp_price_tick_size
from .footprint import comp_bar_footprints

logger = get_logger(__name__)


def _pad_edge(arr: jnp.ndarray, bucket: int) -> jnp.ndarray:
    n = arr.shape[0]
    if bucket == n:
        return arr
    return jnp.concatenate([arr, jnp.full((bucket - n,), arr[-1], arr.dtype)])


def _pad_zero(arr: jnp.ndarray, bucket: int) -> jnp.ndarray:
    n = arr.shape[0]
    if bucket == n:
        return arr
    return jnp.concatenate([arr, jnp.zeros((bucket - n,), arr.dtype)])


class BarBuilderBase(ABC):
    """Template-method base for bar builders.

    Parity: /root/reference/finmlkit/bar/base.py:24-300. Subclasses
    implement ``_comp_bar_close``; products are built by the jitted
    aggregation kernels. ``bar_close_indices``/``bar_close_timestamps``
    exclude the first (open-anchor) element, like the reference
    (base.py:118-129).
    """

    def __init__(self, trades: TradesData):
        self.trades_df = trades.data
        n = len(self.trades_df)
        bucket = next_bucket(n, 1024)
        # device-resident, bucket-padded trade arrays; edge padding keeps
        # timestamps sorted and preserves the reference's wraparound
        # gathers (prices[-1] / sides[-1] at the unaligned first bar)
        self._n_trades = n
        self._ts = _pad_edge(jnp.asarray(self.trades_df["timestamp"].values.astype(np.int64)), bucket)
        self._px = _pad_edge(jnp.asarray(self.trades_df["price"].values.astype(np.float64)), bucket)
        self._amt = _pad_zero(jnp.asarray(self.trades_df["amount"].values.astype(np.float32)), bucket)
        if "side" in self.trades_df.columns:
            self._side = _pad_edge(jnp.asarray(self.trades_df["side"].values.astype(np.int8)), bucket)
        else:
            self._side = None

        # integer-exact fast path: quantize prices to ticks and amounts to
        # 1e-8 units (see bar/quantize.py); falls back to the f64 kernels
        # when the price grid is irregular
        from .quantize import quantize_trades
        q = quantize_trades(self.trades_df["price"].values.astype(np.float64),
                            self.trades_df["amount"].values.astype(np.float32))
        if q is not None:
            self._ticks = _pad_edge(jnp.asarray(q.price_ticks), bucket)
            self._units = _pad_zero(jnp.asarray(q.amount_units), bucket)
            self._tick_size = q.tick_size
            self._amount_scale = q.amount_scale
        else:
            self._ticks = None
            self._units = None
            self._tick_size = None
            self._amount_scale = None

        self._close_ts: Optional[np.ndarray] = None
        self._close_indices: Optional[np.ndarray] = None
        self._ci_padded: Optional[jnp.ndarray] = None
        self._n_bars: Optional[int] = None
        self._highs = None
        self._lows = None
        self._fused_cache = None

    # ------------------------------------------------------------------
    def _indexer_backend(self) -> str:
        """Boundary-scan dispatch: device closed-form/jump kernels vs the
        native host loops.

        On a TPU the device indexers win by orders of magnitude when the
        host is slow (round-3 driver: dollar host scan 14.9 s vs 194 ms
        for the device closed-form path right next to it), and the
        quantized engines are integer-exact. Off-TPU the host loops win.
        ``FMKT_INDEXER`` overrides: "device" | "host" | "auto" (default).
        """
        mode = os.environ.get("FMKT_INDEXER", "auto")
        if mode in ("host", "device"):
            return mode
        # auto: the device path is only integer-exact when quantization
        # succeeded (self._units); the float cumsum indexers can pick
        # different boundaries than the exact host loop near thresholds
        if self._units is None:
            return "host"
        return "device" if _runs_on_tpu(self._ts) else "host"

    # ------------------------------------------------------------------
    def _fused_mode(self) -> Optional[str]:
        """Dispatch decision for the fused single-pass pipeline."""
        mode = os.environ.get("FMKT_FUSED", "auto")
        if mode == "off" or self._ticks is None:
            return None
        if mode == "auto":
            return "native" if _runs_on_tpu(self._ticks) else None
        if mode in ("force", "native"):
            return "native"
        if mode == "interpret":
            return "interpret"
        return None

    def _fused_products(self, mode: str):
        """OHLCV + directional products from ONE fused pass (cached)."""
        if self._fused_cache is None:
            side = self._side if self._side is not None \
                else jnp.zeros(self._ticks.shape, jnp.int8)
            amounts_host = np.ascontiguousarray(
                self.trades_df["amount"].values, dtype=np.float32)
            ci_host = np.asarray(self._ci_padded)
            # packed 3-buffer readback; medians default to the batched
            # row-sort device engine — host-independent (the native
            # nth_element path measured 0.3 s on a fast 2-core host but
            # 2.9 s on the round-3 driver host; the device row sort is
            # ~100 ms at 39M trades regardless of host). FMKT_MEDIANS:
            # "rowsort" (default) | "sort" | "host" | "hist" | "select".
            medians = os.environ.get("FMKT_MEDIANS", "rowsort")
            if medians == "device":  # legacy alias from round 3
                medians = "select"
            self._fused_cache = fused_mod.bar_products_fused(
                self._ticks, self._units, self._ci_padded, side,
                tick_size=self._tick_size, amount_scale=self._amount_scale,
                amounts_host=amounts_host, ci_host=ci_host,
                amounts_f32=self._amt, packed=True, medians=medians,
                scan=os.environ.get("FMKT_SCAN", "rowtail"),
                interpret=(mode == "interpret"))
        return self._fused_cache

    # ------------------------------------------------------------------
    @abstractmethod
    def _comp_bar_close(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return (close_ts, close_indices) incl. the open-anchor element."""

    def _set_bar_close(self):
        if self._close_ts is None:
            close_ts, ci = self._comp_bar_close()
            self._close_ts = np.asarray(close_ts)
            self._close_indices = np.asarray(ci)
            n_bars = len(ci) - 1
            bucket = next_bucket(n_bars + 1, 256) - 1
            ci_p = np.concatenate([
                np.asarray(ci),
                np.full(bucket - n_bars, int(self._close_indices[-1]), np.int64),
            ])
            self._ci_padded = jnp.asarray(ci_p)
            self._n_bars = n_bars

    @property
    def bar_close_indices(self) -> np.ndarray:
        self._set_bar_close()
        return self._close_indices[1:]

    @property
    def bar_close_timestamps(self) -> np.ndarray:
        self._set_bar_close()
        return self._close_ts[1:]

    def _dt_index(self) -> pd.DatetimeIndex:
        return pd.to_datetime(self.bar_close_timestamps, unit="ns")

    # ------------------------------------------------------------------
    def build_ohlcv(self) -> pd.DataFrame:
        """OHLCV + VWAP + trades + median trade size (base.py:132-169)."""
        self._set_bar_close()
        mode = self._fused_mode()
        if mode is not None:
            out, _ = self._fused_products(mode)
        elif self._ticks is not None:
            out = aggregate_q.comp_bar_ohlcv_q(
                self._ticks, self._units, self._amt, self._ci_padded,
                self._tick_size, self._amount_scale)
        else:
            out = aggregate.comp_bar_ohlcv(self._px, self._amt, self._ci_padded)
        nb = self._n_bars
        self._highs = out["high"][:nb]
        self._lows = out["low"][:nb]
        df = pd.DataFrame(
            {k: np.asarray(v[:nb]) for k, v in out.items()},
            index=self._dt_index(),
        )[["open", "high", "low", "close", "volume", "trades",
           "median_trade_size", "vwap"]]
        df.index.name = "timestamp"
        if hasattr(self, "interval"):
            try:
                df.index.freq = pd.Timedelta(seconds=self.interval)
            except ValueError:
                pass  # empty-bar duplicates prevent a fixed freq
        return df

    def build_directional_features(self) -> pd.DataFrame:
        """Order-flow splits and cum-imbalance extrema (base.py:171-212)."""
        self._set_bar_close()
        if self._side is None:
            raise ValueError("Trades data has no 'side' column.")
        mode = self._fused_mode()
        if mode is not None:
            _, out = self._fused_products(mode)
        elif self._ticks is not None:
            out = aggregate_q.comp_bar_directional_features_q(
                self._ticks, self._units, self._ci_padded, self._side,
                self._tick_size, self._amount_scale)
        else:
            out = aggregate.comp_bar_directional_features(
                self._px, self._amt, self._ci_padded, self._side)
        nb = self._n_bars
        df = pd.DataFrame({k: np.asarray(v[:nb]) for k, v in out.items()},
                          index=self._dt_index())
        df.index.name = "timestamp"
        return df

    def build_trade_size_features(self, theta, theta_mult: float = 5.0) -> pd.DataFrame:
        """Relative trade-size features (base.py:214-245)."""
        self._set_bar_close()
        nb = self._n_bars
        if np.isscalar(theta):
            theta = np.full(nb, float(theta), np.float64)
        theta = np.asarray(theta, dtype=np.float64)
        if len(theta) != nb:
            raise ValueError("Theta should match the number of bars.")
        theta_pad = np.concatenate(
            [theta, np.zeros(self._ci_padded.shape[0] - 1 - nb)])
        # same host-independence policy as the median/indexer dispatch
        # (round-3 lesson: host-first paths are hostage to whatever host
        # runs the pipeline): device kernels on a TPU, the fused native
        # host pass otherwise. FMKT_TRADE_SIZE overrides.
        mode_ts = os.environ.get("FMKT_TRADE_SIZE", "auto")
        if mode_ts == "auto":
            mode_ts = "device" if _runs_on_tpu(self._ts) else "host"
        out = None
        if mode_ts == "host":
            out = fused_mod.trade_size_features_native(
                np.ascontiguousarray(self.trades_df["amount"].values,
                                     dtype=np.float32),
                np.asarray(self._ci_padded), theta_pad, theta_mult)
        if out is None:
            theta_p = jnp.asarray(theta_pad)
            if self._ticks is not None:
                out = aggregate_q.comp_bar_trade_size_features_q(
                    self._units, self._amt, theta_p, self._ci_padded,
                    theta_mult, self._amount_scale)
            else:
                out = aggregate.comp_bar_trade_size_features(
                    self._amt, theta_p, self._ci_padded, theta_mult)
        df = pd.DataFrame({k: np.asarray(v[:nb]) for k, v in out.items()},
                          index=self._dt_index())
        df.index.name = "timestamp"
        return df

    def build_footprints(self, price_tick_size=None,
                         imbalance_factor: float = 3.0) -> FootprintData:
        """Dense footprint tensors + order-flow features (base.py:247-300)."""
        self._set_bar_close()
        if self._highs is None or self._lows is None:
            self.build_ohlcv()
        if price_tick_size is None:
            price_tick_size = comp_price_tick_size(
                self.trades_df["price"].values)
        logger.info(f"Price tick size is set to: {price_tick_size}")
        if self._side is None:
            raise ValueError("Trades data has no 'side' column.")

        nb = self._n_bars
        lows = np.asarray(self._lows)
        highs = np.asarray(self._highs)
        low_t = np.round(lows / price_tick_size).astype(np.int64)
        high_t = np.round(highs / price_tick_size).astype(np.int64)
        n_levels = (high_t - low_t + 1).astype(np.int64)
        max_levels = int(next_bucket(max(int(n_levels.max()), 1), 8))

        nbp = self._ci_padded.shape[0] - 1

        # integer fast path when the footprint tick grid is an integer
        # refinement of the quantization grid
        ratio = None
        if self._ticks is not None:
            r = self._tick_size / price_tick_size
            if abs(r - round(r)) < 1e-9 and round(r) >= 1:
                ratio = int(round(r))
        if ratio is not None and abs(low_t.max() * ratio) < 2**31 - 1:
            from .footprint_q import comp_bar_footprints_q
            low_p = jnp.asarray(np.concatenate(
                [low_t, np.full(nbp - nb, low_t[-1])]).astype(np.int32))
            high_p = jnp.asarray(np.concatenate(
                [high_t, np.full(nbp - nb, high_t[-1])]).astype(np.int32))
            foot_ticks = self._ticks.astype(jnp.int32) * ratio
            out = comp_bar_footprints_q(
                foot_ticks, self._amt, self._ci_padded, self._side,
                low_p, high_p, imbalance_factor, max_levels=max_levels)
            host = {k: np.asarray(v)[:nb] for k, v in out.items()}
        else:
            lows_p = jnp.asarray(np.concatenate([lows, np.full(nbp - nb, lows[-1])]))
            highs_p = jnp.asarray(np.concatenate([highs, np.full(nbp - nb, highs[-1])]))
            out = comp_bar_footprints(
                self._px, self._amt, self._ci_padded, self._side,
                price_tick_size, lows_p, highs_p, imbalance_factor,
                max_levels=max_levels)
            host = {k: np.asarray(v[:nb]) for k, v in out.items()}
        return FootprintData(
            bar_timestamps=self.bar_close_timestamps,
            price_tick=price_tick_size,
            **host,
        )


class TimeBarKit(BarBuilderBase):
    """Fixed-interval time bars (kit.py:12-35)."""

    def __init__(self, trades: TradesData, period: pd.Timedelta):
        super().__init__(trades)
        self.interval = period.total_seconds()

    def _comp_bar_close(self):
        ts = self._ts[: self._n_trades]
        host_ts = self.trades_df["timestamp"].values
        return indexers.time_bar_indexer(
            ts, self.interval, ts_first=int(host_ts[0]),
            ts_last_i=int(host_ts[-1]))


class TickBarKit(BarBuilderBase):
    """Fixed tick-count bars (kit.py:38-67)."""

    def __init__(self, trades: TradesData, tick_count_thrs: int):
        super().__init__(trades)
        self.tick_count_thrs = tick_count_thrs

    def _comp_bar_close(self):
        ts = self._ts[: self._n_trades]
        return indexers.tick_bar_indexer(ts, self.tick_count_thrs)


class VolumeBarKit(BarBuilderBase):
    """Volume-threshold bars, reset-to-zero semantics (kit.py:70-101)."""

    def __init__(self, trades: TradesData, volume_ths: float):
        super().__init__(trades)
        self.volume_ths = volume_ths

    def _comp_bar_close(self):
        if self._indexer_backend() == "host":
            host = indexers.volume_bar_indexer_host(
                self.trades_df["timestamp"].values,
                self.trades_df["amount"].values, self.volume_ths)
            if host is not None:
                return host
        ts = self._ts[: self._n_trades]
        if self._units is not None:
            return indexers.volume_bar_indexer_q(
                ts, self._units[: self._n_trades], self.volume_ths,
                self._amount_scale)
        vol = self._amt[: self._n_trades]
        return indexers.volume_bar_indexer(ts, vol, self.volume_ths)


class DollarBarKit(BarBuilderBase):
    """Dollar-threshold bars, carry-remainder semantics (kit.py:105-137)."""

    def __init__(self, trades: TradesData, dollar_thrs: float):
        super().__init__(trades)
        self.dollar_thrs = dollar_thrs

    def _comp_bar_close(self):
        if self._indexer_backend() == "host":
            host = indexers.dollar_bar_indexer_host(
                self.trades_df["timestamp"].values,
                self.trades_df["price"].values,
                self.trades_df["amount"].values, self.dollar_thrs)
            if host is not None:
                return host
        ts = self._ts[: self._n_trades]
        if self._units is not None:
            return indexers.dollar_bar_indexer_q(
                ts, self._ticks[: self._n_trades],
                self._units[: self._n_trades], self.dollar_thrs,
                self._tick_size, self._amount_scale)
        px = self._px[: self._n_trades]
        vol = self._amt[: self._n_trades]
        return indexers.dollar_bar_indexer(ts, px, vol, self.dollar_thrs)


class _InfoBarKitBase(BarBuilderBase):
    """Shared host logic for imbalance / run bar kits.

    The reference declares these bar types but raises NotImplementedError
    (bar/logic.py:224-261) — implemented here (AFML ch. 2.3.2 semantics;
    see finmlkit_tpu/bar/indexers.py).
    """

    _indexer = None  # set by subclass

    def __init__(self, trades: TradesData, mode: str = "tick", *,
                 threshold: Optional[float] = None,
                 expected_ticks_init: Optional[float] = None,
                 expected_rate_init: Optional[float] = None,
                 alpha_ticks: float = 0.0, alpha_rate: float = 0.0):
        super().__init__(trades)
        if mode not in ("tick", "volume", "dollar"):
            raise ValueError(f"mode must be tick/volume/dollar, got {mode!r}")
        if self._side is None:
            raise ValueError("imbalance/run bars need trade sides "
                             "(preprocess trades with side inference)")
        self.mode = mode
        self.threshold = threshold
        self.expected_ticks_init = expected_ticks_init
        self.expected_rate_init = expected_rate_init
        self.alpha_ticks = alpha_ticks
        self.alpha_rate = alpha_rate

    def _comp_bar_close(self):
        import jax
        n = self._n_trades
        ts = self._ts[:n]
        side = self._side[:n]
        if self.mode == "tick":
            weights = None
        elif self.mode == "volume":
            weights = self._amt[:n]
        else:
            weights = self._px[:n] * self._amt[:n].astype(jnp.float64) \
                if jax.default_backend() != "tpu" \
                else self._px[:n].astype(jnp.float32) * self._amt[:n]
        dtype = "float32" if jax.default_backend() == "tpu" else None
        fn = type(self)._indexer
        return fn(ts, side, weights, threshold=self.threshold,
                  expected_ticks_init=self.expected_ticks_init,
                  expected_rate_init=self.expected_rate_init,
                  alpha_ticks=self.alpha_ticks, alpha_rate=self.alpha_rate,
                  dtype=dtype)


class ImbalanceBarKit(_InfoBarKitBase):
    """Tick/volume/dollar imbalance bars (beyond-reference; see base)."""
    _indexer = staticmethod(indexers.imbalance_bar_indexer)


class RunBarKit(_InfoBarKitBase):
    """Tick/volume/dollar run bars (beyond-reference; see base)."""
    _indexer = staticmethod(indexers.run_bar_indexer)


class CUSUMBarKit(BarBuilderBase):
    """Adaptive-threshold CUSUM bars (kit.py:140-181)."""

    def __init__(self, trades: TradesData, sigma, sigma_floor: float = 5e-4,
                 sigma_mult: float = 2.0):
        super().__init__(trades)
        self.lambda_mult = sigma_mult
        self._sigma = np.asarray(sigma, dtype=np.float64)
        self.sigma_floor = sigma_floor

    def _comp_bar_close(self):
        import jax
        # CUSUM keeps host-first under "auto": its adaptive thresholds are
        # f64-sequential in the reference and the TPU tier runs f32 —
        # boundary decisions are discrete, so exactness wins by default.
        # FMKT_INDEXER=device forces the device event-jump scan.
        if os.environ.get("FMKT_INDEXER", "auto") != "device":
            host = indexers.cusum_bar_indexer_host(
                self.trades_df["timestamp"].values,
                self.trades_df["price"].values, self._sigma,
                self.sigma_floor, self.lambda_mult)
            if host is not None:
                close_ts, ci, filled = host
                self._sigma = filled
                return close_ts, ci
        ts = self._ts[: self._n_trades]
        px = self._px[: self._n_trades]
        dtype = "float32" if jax.default_backend() == "tpu" else None
        close_ts, ci, filled = indexers.cusum_bar_indexer(
            ts, px, jnp.asarray(self._sigma), self.sigma_floor,
            self.lambda_mult, dtype=dtype)
        self._sigma = np.asarray(filled)  # the reference fills NaNs in place
        return close_ts, ci

    def get_sigma(self) -> np.ndarray:
        return self._sigma[self.bar_close_indices]
