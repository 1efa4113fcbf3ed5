"""Run reference-style YAML operation configs directly.

A user of the reference drives it with
``FeatureCalculator('Configurations/basic.yaml')``; this module gives
the engine the same entry point: ``yaml_feature_set(path)`` parses the
same YAML dialect (including the custom ``!range [a, b]`` inclusive-tag,
calculator.py:10-14), translates each (module, function) to the engine's
numpy kernel through an adapter table, and compiles a FeatureSet whose
labels follow the reference's naming (base_name + ordered_args + the
same value mangling + ``_raw`` suffixes).

Unsupported kernel methods (none currently — the last gap, ts2vg's
'norm' visibility graph, now has a native implementation) would simply
raise inside the kernel and surface as NaN via the registry's
per-feature error isolation — exactly how the reference records
per-feature errors (calculator.py:101-104).
"""

from __future__ import annotations

import numpy as np
import yaml

from pyhctsa_spark.functions import distribution_extra as DX
from pyhctsa_spark.functions import embedding as EM
from pyhctsa_spark.functions import entropy as E
from pyhctsa_spark.functions import info as I
from pyhctsa_spark.functions import kernels as K
from pyhctsa_spark.functions import medical as MD
from pyhctsa_spark.functions import model as M
from pyhctsa_spark.functions import physics as PH
from pyhctsa_spark.functions import spectral as SP
from pyhctsa_spark.functions import stationarity_extra as SX
from pyhctsa_spark.functions import symbolic as SY
from pyhctsa_spark.functions import wavelet as WL
from pyhctsa_spark.plans.registry import FeatureSet, Operation, expand


class _RangeLoader(yaml.SafeLoader):
    pass


def _range_constructor(loader, node):
    a, b = loader.construct_sequence(node)
    return list(range(a, b + 1))


_RangeLoader.add_constructor("!range", _range_constructor)


def _tau_of(y, tau):
    if isinstance(tau, str) and tau in ("tau", "ac"):
        return max(1, int(K.first_crossing_ac(y)["firstCrossing"]))
    if isinstance(tau, str) and tau == "mi":
        return max(1, int(I.first_min(y, "mi", max_tau=min(len(y) // 2, 100))))
    return int(tau)


def _nbins_rule(y, rule):
    """Histogram bin-count rules matching numpy/MATLAB conventions."""
    n = len(y)
    if rule == "sqrt":
        return max(1, int(np.ceil(np.sqrt(n))))
    if rule == "sturges":
        return max(1, int(np.ceil(np.log2(n)) + 1))
    if rule == "fd":
        iqr = K.spread_iqr(y)
        if iqr <= 0:
            return 10
        h = 2.0 * iqr / n ** (1.0 / 3.0)
        return max(1, int(np.ceil(np.ptp(y) / h)))
    if rule == "auto":
        return max(_nbins_rule(y, "sturges"), _nbins_rule(y, "fd"))
    raise ValueError(rule)


def _first_crossing(y, corrFun="ac", threshold=0.0, whatOut="both"):
    out = K.first_crossing_ac(y, threshold)
    if whatOut == "discrete":
        return out["firstCrossing"]
    if whatOut == "continuous":
        return out["pointOfCrossing"]
    return out


def _first_min(y, minWhat="ac", extraParam=None, minNotMax=True):
    # the reference treats ANY falsy minNotMax ('' in basic.yaml, False)
    # as the first-MAXIMUM branch (Information.py:61)
    mnm = bool(minNotMax)
    what = "ac" if minWhat == "ac" else "mi"
    est = "gaussian"
    if isinstance(minWhat, str) and minWhat.startswith("mi"):
        suffix = minWhat.split("-", 1)[1] if "-" in minWhat else "gaussian"
        est = {"gaussian": "gaussian", "kernel": "kernel",
               "kraskov1": "kraskov1", "kraskov2": "kraskov1",
               "hist": "gaussian"}.get(suffix, "gaussian")
    return I.first_min(y, what, est_method=est, min_not_max=mnm)


def _shannon(y, numBins=2, depth=3):
    bins = numBins if isinstance(numBins, list) else [numBins]
    depths = depth if isinstance(depth, list) else [depth]
    if len(bins) == 1 and len(depths) == 1:
        return E.shannon_entropy_ms(y, int(bins[0]), int(depths[0]))
    if len(depths) > 1 and len(bins) == 1:
        ents = np.array([E.shannon_entropy_ms(y, int(bins[0]), int(d)) for d in depths])
    else:
        # reference's bin sweep does NOT normalize by depth
        ents = np.array([
            E.shannon_entropy_ms(y, int(b), int(depths[0])) * depths[0]
            for b in bins
        ])
    return {
        "maxent": float(np.max(ents)), "minent": float(np.min(ents)),
        "medent": float(np.median(ents)), "meanent": float(np.mean(ents)),
        "stdent": float(np.std(ents, ddof=1)),
    }


def _kpss(y, lags=0):
    # a list reaches here only from the YAML's nested-list form
    # ([!range [0, 10]]) — the reference's multi-lag sweep branch
    if isinstance(lags, list):
        return M.kpss_test(y, [int(v) for v in lags])
    return M.kpss_test(y, int(lags))


def _var_ratio(y, periods=2, IIDs=1):
    if isinstance(periods, list):
        # a scalar IIDs with a periods sweep broadcasts (list(1) would
        # TypeError and silently NaN the whole family through error
        # isolation)
        iids = (list(IIDs) if isinstance(IIDs, (list, tuple))
                else [IIDs] * len(periods))
        return M.variance_ratio_test(y, [int(p) for p in periods], iids)
    return M.variance_ratio_test(y, int(periods), bool(IIDs))


def _moment_corr(y, windowLength=None, wOverlap=None, mom1="mean", mom2="std",
                 whatTransform="none"):
    return K.moment_corr(y, windowLength, wOverlap, mom1, mom2, whatTransform)


def _loop_local_simple(y, forecastMeth="mean"):
    """Sweep trainLength of LocalSimple (1..10 for 'mean', 1,3,..,17 for
    'median'); normalized curve-shape stats of the stderr / sws / swm /
    ac1 / ac2 curves. Parity: FC_LoopLocalSimple (ModelFit.py:15-77),
    reference output names."""
    if forecastMeth == "mean":
        train_range = range(1, 11)
    elif forecastMeth == "median":
        train_range = range(1, 19, 2)
    else:
        raise ValueError(forecastMeth)
    stats = [K.local_simple(y, forecastMeth, tl) for tl in train_range]
    out = {}
    for key, name in (
        ("stderr", "stderr"), ("sws", "sws"), ("swm", "swm"),
        ("ac1", "ac1"), ("ac2", "ac2"),
    ):
        curve = np.array([s[key] for s in stats], dtype=np.float64)
        rng_ = np.ptp(curve)
        with np.errstate(invalid="ignore", divide="ignore"):
            out[f"{name}_chn"] = float(np.mean(np.diff(curve)) / rng_)
            out[f"{name}_meansgndiff"] = float(np.mean(np.sign(np.diff(curve))))
            if name != "stderr":
                out[f"{name}_stdn"] = float(np.std(curve, ddof=1) / rng_)
    return out


def _hist_mode(y, numBins=10, doAbs=0):
    x = np.abs(y) if doAbs else y
    if isinstance(numBins, list):
        return {f"mode{b}": K.histogram_mode(x, int(b)) for b in numBins}
    return K.histogram_mode(x, int(numBins))


def _mse(y, scaleRange=None, m=2, r=0.15, preProcessHow=None):
    x = np.diff(y) if preProcessHow == "diff1" else y
    scales = list(scaleRange) if scaleRange else [1, 2, 3, 4, 5]
    return E.multiscale_entropy(x, scales, int(m), float(r))


def _dist_entropy(y, histOrKS="hist", numBins=10, olremp=0):
    if numBins in ([], None):
        numBins = 10 if histOrKS == "hist" else 0
    elif isinstance(numBins, str):
        numBins = _nbins_rule(y, numBins) if histOrKS == "hist" else 0
    return E.distribution_entropy(y, histOrKS, numBins, float(olremp or 0))


def _glscf(y, alpha=1.0, beta=1.0, tau=1):
    return K.glscf(y, float(alpha), float(beta), _tau_of(y, tau))


def _nl_ac(y, taus=(0, 1, 2), doAbs=None):
    # doAbs passes straight through: the reference applies |.| to the
    # lag-product BEFORE the mean (Correlation.py:795-796), and
    # None auto-resolves by tau-count parity inside the kernel.
    return K.nonlinear_autocorr(y, list(taus), None if doAbs is None else bool(doAbs))


def _lz(y, nbits=2, preProc=None):
    pp = "diff" if preProc == "diff" else None
    return E.lz_complexity(y, int(nbits), pp)


# (module, function) -> adapter taking (y, **yaml_params)
FUNC_TABLE = {
    ("Correlation", "AutoCorr"): lambda y, tau=1: K.autocorr_fourier(y, _tau_of(y, tau)),
    ("Correlation", "GLSCF"): _glscf,
    ("Correlation", "FZCGLSCF"): lambda y, alpha=1.0, beta=1.0: K.fzcglscf(y, alpha, beta),
    ("Correlation", "Embed2"): lambda y, tau="tau": EM.embed2(y, tau),
    ("Correlation", "Embed2Shapes"): lambda y, tau="tau", shape="circle", r=1.0: EM.embed2_shapes(y, tau, shape, r),
    ("Correlation", "Embed2Basic"): lambda y, tau=1: K.embed2_basic(y, _tau_of(y, tau)),
    ("Correlation", "Embed2Dist"): lambda y, tau="tau": EM.embed2_dist(y, tau),
    ("Correlation", "Embed2_AngleTau"): lambda y, maxTau=10: EM.embed2_angle_tau(y, int(maxTau)),
    ("Correlation", "PartialAutoCorr"): lambda y, maxTau=10, whatMethod=None: M.partial_autocorr(y, int(maxTau)),
    ("Correlation", "NonlinearAutoCorr"): _nl_ac,
    ("Correlation", "StickAngles"): lambda y: EM.stick_angles(y),
    ("Correlation", "FirstCrossing"): _first_crossing,
    ("Correlation", "TranslateShape"): lambda y, shape="circle", d=2, howToMove="pts": EM.translate_shape(y, shape, d, howToMove),
    ("Correlation", "AutoCorrShape"): lambda y, stopWhen="posDrown": EM.autocorr_shape(y, stopWhen),
    ("Correlation", "HistogramAMI"): lambda y, tau=1, meth="even", numBins=10: I.histogram_ami(y, tau, meth, numBins),
    ("Correlation", "CompareMinAMI"): lambda y, binMethod="std1", numBins=10: I.compare_min_ami(y, binMethod, numBins),
    ("Correlation", "PeriodicityWang"): lambda y: EM.periodicity_wang(y),
    ("Correlation", "TRev"): lambda y, tau=1: K.trev(y, _tau_of(y, tau)),
    ("Correlation", "TC3"): lambda y, tau=1: K.tc3(y, _tau_of(y, tau)),
    ("Correlation", "TimeRevKaplan"): lambda y, timeLag=1: K.timerev_kaplan(y, int(timeLag)),
    ("Correlation", "Crinkle"): lambda y: K.crinkle(y),
    ("Correlation", "TheilerQ"): lambda y: K.theiler_q(y),
    ("Information", "AutoMutualInfoStats"): lambda y, maxTau=None, estMethod="gaussian", extraParam=None: I.ami_stats(y, maxTau, "gaussian" if estMethod in ("kernel", "kraskov1", "kraskov2") and len(y) > 4000 else {"kernel": "kernel", "kraskov1": "kraskov1", "kraskov2": "kraskov1"}.get(estMethod, "gaussian")),
    ("Information", "AMInformation"): lambda y, tau=1: I.rm_information(y, int(tau)),
    ("Information", "FirstMin"): _first_min,
    ("Entropy", "DistributionEntropy"): _dist_entropy,
    ("Entropy", "LZComplexity"): _lz,
    ("Entropy", "ComplexityInvariantDistance"): lambda y: K.cid_ce(y),
    ("Entropy", "ApproximateEntropy"): lambda y, mnom=1, rth=0.2: E.approximate_entropy(y, int(mnom), float(rth)),
    ("Entropy", "RPDE"): lambda y, m=2, tau=1: E.rpde(y, int(m), int(tau)),
    ("Entropy", "SampleEntropy"): lambda y, M=2, r=None, preProcessHow=None: E.sample_entropy(y, int(M), r, preProcessHow),
    ("Entropy", "MultiScaleEntropy"): _mse,
    ("Entropy", "ShannonEntropy"): _shannon,
    ("Stationarity", "StatAv"): lambda y, whatType="seg", extraParam=5: K.stat_av(y, whatType, int(extraParam)),
    ("Stationarity", "Trend"): lambda y: K.trend(y),
    ("Stationarity", "StdNthDer"): lambda y, ndr=1: K.std_nth_der(y, int(ndr)),
    ("Stationarity", "TSLength"): lambda y: float(len(y)),
    ("Stationarity", "FitPolynomial"): lambda y, k=1: K.fit_polynomial(y, int(k)),
    ("Stationarity", "SlidingWindow"): lambda y, windowStat="mean", acrossWinStat="std", numSeg=5, incMove=2: K.sliding_window(y, windowStat, acrossWinStat, int(numSeg), int(incMove)),
    ("Stationarity", "LocalGlobal"): lambda y, subsetHow="l", nsamps=100: K.local_global(y, subsetHow, nsamps),
    ("Stationarity", "DriftingMean"): lambda y, segmentHow="fix", l=20: K.drifting_mean(y, segmentHow, int(l)),
    ("Stationarity", "RangeEvolve"): lambda y: K.range_evolve(y),
    ("Stationarity", "KPSSTest"): _kpss,
    ("Stationarity", "LocalExtrema"): lambda y, howToWindow="l", n=None: SX.local_extrema(y, howToWindow, n),
    ("Stationarity", "SimpleStats"): lambda y, whatStat="zcross": K.simple_stats(y, whatStat),
    ("Stationarity", "MomentCorr"): _moment_corr,
    ("Stationarity", "DynWin"): lambda y, maxNumSegments=10: SX.dyn_win(y, int(maxNumSegments)),
    ("Stationarity", "LocalDistributions"): lambda y, numSegs=5, eachOrPar="par": SX.local_distributions(y, int(numSegs), eachOrPar),
    ("Distribution", "Withinp"): lambda y, p=1.0, meanOrMedian="mean": K.withinp(y, float(p), meanOrMedian),
    ("Distribution", "Unique"): lambda y: K.unique_fraction(y),
    ("Distribution", "Spread"): lambda y, spreadMeasure="std": {
        "std": K.spread_std, "iqr": K.spread_iqr, "mad": K.spread_mad,
        "mead": K.spread_mead,
    }[spreadMeasure](y),
    ("Distribution", "Quantile"): lambda y, p=0.5: K.quantile_hazen(y, float(p)),
    ("Distribution", "ProportionValues"): lambda y, propWhat="positive": K.proportion_values(y, propWhat),
    ("Distribution", "PLeft"): lambda y, th=0.1: DX.pleft(y, float(th)),
    ("Distribution", "MinMax"): lambda y, minOrMax="max": K.minmax(y, minOrMax),
    ("Distribution", "Mean"): lambda y, meanType="arithmetic": DX.mean_types(y, meanType),
    ("Distribution", "HighLowMu"): lambda y: K.high_low_mu(y),
    ("Distribution", "FitMLE"): lambda y, fitWhat="gaussian": DX.fit_mle(y, fitWhat),
    ("Distribution", "CV"): lambda y, k=1: K.cv(y, int(k)),
    ("Distribution", "CustomSkewness"): lambda y, whatSkew="pearson": K.custom_skewness(y, whatSkew),
    ("Distribution", "Burstiness"): lambda y: K.burstiness(y),
    ("Distribution", "Moments"): lambda y, theMom=3: K.moments(y, int(theMom)),
    ("Distribution", "OutlierInclude"): lambda y, thresholdHow="abs", inc=0.01: DX.outlier_include(y, thresholdHow, float(inc)),
    ("Distribution", "TrimmedMean"): lambda y, pExclude=0.0: K.trimmed_mean(y, float(pExclude)),
    ("Distribution", "RemovePoints"): lambda y, removeHow="absfar", p=0.1, removeOrSaturate="remove": DX.remove_points(y, removeHow, float(p), removeOrSaturate),
    ("Scaling", "FastDFA"): lambda y: PH.fast_dfa(y),
    ("Symbolic", "TransitionMatrix"): lambda y, howtocg="quantile", numGroups=2, tau=1: SY.transition_matrix(y, howtocg, int(numGroups), tau),
    ("Symbolic", "BinaryStats"): lambda y, binaryMethod="diff": K.binary_stats(y, binaryMethod),
    ("Symbolic", "MotifThree"): lambda y, cgHow="quantile": SY.motif_three(y, cgHow),
    ("Symbolic", "MotifTwo"): lambda y, binarizeHow="diff": K.motif_two(y, binarizeHow),
    ("Symbolic", "BinaryStretch"): lambda y, stretchWhat="lseq1": SY.binary_stretch(y, stretchWhat),
    ("Symbolic", "HistogramAsymmetry"): lambda y, numBins=11, doSimple=True: DX.histogram_asymmetry(y, int(numBins)),
    ("Symbolic", "HistogramMode"): _hist_mode,
    ("Symbolic", "Surprise"): lambda y, whatPrior="dist", memory=0.2, numGroups=3, coarseGrainMethod="quantile", numIters=500: SY.surprise(y, whatPrior, memory, numGroups if isinstance(numGroups, str) else int(numGroups), coarseGrainMethod, int(numIters)),
    ("Wavelet", "WLCoeffs"): lambda y, wname="db3", level=3: WL.wl_coeffs(y, wname, level),
    ("Wavelet", "DetailCoeffs"): lambda y, wname="db3", maxlevel="max": WL.detail_coeffs(y, wname, maxlevel),
    ("Wavelet", "CWT"): lambda y, wname="db3", maxScale=32: WL.cwt_features(y, wname, int(maxScale)),
    ("HypothesisTests", "HypothesisTest"): lambda y, theTest="signtest": M.hypothesis_test(y, theTest),
    ("HypothesisTests", "VarianceRatioTest"): _var_ratio,
    ("Spectral", "SpectralSummaries"): lambda y, psdMeth="fft", windowType="none": SP.spectral_summaries(y, psdMeth, windowType),
    ("ModelFit", "ARCov"): lambda y, p=2: M.ar_cov(y, int(p)),
    ("ModelFit", "ARFit"): lambda y, pmin=1, pmax=10, selector="sbc": M.ar_fit_select(y, int(pmin), int(pmax), selector),
    ("ModelFit", "ExpSmoothing"): lambda y, ntrain=None, alpha="best": M.exp_smoothing(y, ntrain, alpha),
    ("ModelFit", "LocalSimple"): lambda y, forecastMeth="mean", trainLength=4: K.local_simple(y, forecastMeth, _tau_of(y, trainLength)),
    ("ModelFit", "LoopLocalSimple"): _loop_local_simple,
    ("Graph", "VisibilityGraph"): lambda y, meth="horiz": PH.visibility_graph(y, meth),
    ("Physics", "ForcePotential"): lambda y, whatPotential="dblwell", params=None: PH.force_potential(y, whatPotential, params),
    ("Physics", "Walker"): lambda y, walkerRule="prop", walkerParams=None: PH.walker(y, walkerRule, walkerParams),
    ("PreProcess", "PreProcCompare"): lambda y, detrendMeth="diff1": SX.preproc_compare(y, detrendMeth),
    ("Medical", "HRVClassic"): lambda y: MD.hrv_classic(y),
    ("Medical", "PNN"): lambda y: MD.pnn_set(y),
    ("Medical", "PolVar"): lambda y, d=1, D=6: MD.polvar(y, float(d), int(D)),
    ("Medical", "RawHRVMeas"): lambda y: MD.raw_hrv_meas(y),
    ("ExtremeEvents", "MovingThreshold"): lambda y, a=1.0, b=0.1: PH.moving_threshold(y, float(a), float(b)),
    ("Criticality", "RAD"): lambda y, tau=2: K.rad(y, _tau_of(y, tau)),
}
# module aliases: some configs register these ops under Distribution
# (basic.yaml places HistogramMode/Asymmetry under Symbolic)
FUNC_TABLE[("Distribution", "OutlierTest")] = (
    lambda y, p=2, justMe=None: DX.outlier_test(y, float(p), justMe)
)
FUNC_TABLE[("Distribution", "HistogramAsymmetry")] = FUNC_TABLE[
    ("Symbolic", "HistogramAsymmetry")
]
FUNC_TABLE[("Distribution", "HistogramMode")] = FUNC_TABLE[
    ("Symbolic", "HistogramMode")
]


def load_yaml_operations(path: str) -> tuple[list[Operation], list[str]]:
    """Parse a reference-style YAML config into engine Operations.

    Returns (operations, unmapped) where ``unmapped`` lists
    ``Module.Function`` keys with no engine adapter (skipped).
    """
    with open(path) as f:
        cfg = yaml.load(f, Loader=_RangeLoader)
    ops: list[Operation] = []
    unmapped: list[str] = []
    for module, funcs in cfg.items():
        for fn_name, spec in (funcs or {}).items():
            if not spec:  # stub entries (e.g. catch22.yaml) carry no config
                continue
            fn = FUNC_TABLE.get((module, fn_name))
            if fn is None:
                unmapped.append(f"{module}.{fn_name}")
                continue
            configs = []
            for c in spec.get("configs") or [{}]:
                configs.append(dict(c) if c else {})
            ops.append(
                Operation(
                    fn,
                    spec.get("base_name", fn_name),
                    spec.get("ordered_args") or [],
                    configs,
                )
            )
    return ops, unmapped


def yaml_feature_set(path: str, probe_len: int = 512) -> FeatureSet:
    ops, unmapped = load_yaml_operations(path)
    if unmapped:
        import warnings

        warnings.warn(f"unmapped operations skipped: {unmapped}")
    return FeatureSet(expand(ops), probe_len)
