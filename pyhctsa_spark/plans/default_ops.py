"""Default operation catalog — the engine's equivalent of the
reference's Configurations/*.yaml, expressed as a Python registry
(SURVEY.md §1.2: the YAML op config maps to a registry that generates
the struct schema and kernel list at plan time).

Grids mirror representative reference configs (e.g. correlation.yaml's
``AC`` tau ranges); ``default_feature_set()`` compiles them into one
fused kernel per window batch.
"""

from __future__ import annotations

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


def default_operations() -> list[Operation]:
    return [
        # --- Distribution -------------------------------------------------
        Operation(K.mean_, "DN_Mean"),
        Operation(K.spread_std, "DN_Spread_std"),
        Operation(K.spread_iqr, "DN_Spread_iqr"),
        Operation(K.spread_mad, "DN_Spread_mad"),
        Operation(K.spread_mead, "DN_Spread_mead"),
        Operation(K.burstiness, "DN_Burstiness"),
        Operation(K.moments, "DN_Moments", ["k"], [{"k": [3, 4, 5]}]),
        Operation(K.cv, "DN_cv", ["k"], [{"k": [1, 2]}]),
        Operation(K.quantile_hazen, "DN_Quantile", ["p"],
                  [{"p": [0.1, 0.25, 0.5, 0.75, 0.9]}]),
        Operation(K.withinp, "DN_Withinp", ["p"], [{"p": [1.0, 2.0]}]),
        Operation(K.unique_fraction, "DN_Unique"),
        Operation(K.proportion_values, "DN_ProportionValues", ["which"],
                  [{"which": ["positive", "zeros", "geq0"]}]),
        Operation(K.minmax, "DN_MinMax", ["which"],
                  [{"which": ["max", "min"]}]),
        Operation(K.high_low_mu, "DN_HighLowMu"),
        Operation(K.trimmed_mean, "DN_TrimmedMean", ["p_exclude"],
                  [{"p_exclude": [2.0, 10.0, 50.0]}]),
        Operation(K.histogram_mode, "DN_HistogramMode", ["num_bins"],
                  [{"num_bins": [5, 10, 21]}]),
        Operation(K.custom_skewness, "DN_CustomSkewness", ["which"],
                  [{"which": ["pearson", "bowley"]}]),
        # --- Correlation --------------------------------------------------
        Operation(K.autocorr_fourier, "AC", ["tau"],
                  [{"tau": list(range(1, 11)), "zscore": True}]),
        Operation(K.autocorr_timedomain, "AC_td", ["tau"],
                  [{"tau": [1, 2, 3], "zscore": True}]),
        Operation(K.first_crossing_ac, "CO_FirstCrossing",
                  configs=[{"zscore": True}]),
        Operation(K.first_min_ac, "CO_FirstMin_ac", configs=[{"zscore": True}]),
        Operation(K.glscf, "CO_glscf", ["alpha", "beta", "tau"],
                  [{"alpha": [1.0, 2.0], "beta": [1.0, 2.0], "tau": [1, 2],
                    "zscore": True}]),
        Operation(K.fzcglscf, "CO_fzcglscf", ["alpha", "beta"],
                  [{"alpha": [1.0, 2.0], "beta": [1.0, 5.0], "zscore": True}]),
        Operation(K.nonlinear_autocorr, "AC_nl", ["taus"],
                  [{"taus": [[1, 1], [1, 2], [1, 1, 2], [0, 0, 1]],
                    "zscore": True}]),
        Operation(K.trev, "CO_trev", ["tau"],
                  [{"tau": [1, 2, 3], "zscore": True}]),
        Operation(K.tc3, "CO_tc3", ["tau"],
                  [{"tau": [1, 2, 3], "zscore": True}]),
        Operation(K.theiler_q, "DK_theilerQ", configs=[{"zscore": True}]),
        Operation(K.crinkle, "DK_crinkle", configs=[{"zscore": True}]),
        Operation(K.timerev_kaplan, "DK_timerev", ["tau"],
                  [{"tau": [1, 2, 3], "zscore": True}]),
        Operation(K.embed2_basic, "CO_Embed2_Basic", ["tau"],
                  [{"tau": [1], "zscore": True}]),
        Operation(M.partial_autocorr, "CO_PartialAutoCorr", ["max_tau"],
                  [{"max_tau": [10], "zscore": True}]),
        # --- Stationarity -------------------------------------------------
        Operation(K.stat_av, "SY_StatAv", ["what_type", "n"],
                  [{"what_type": "seg", "n": [2, 3, 4, 5, 10], "zscore": True},
                   {"what_type": "len", "n": [25, 50, 100], "zscore": True}]),
        Operation(K.sliding_window, "SY_SlidingWindow",
                  ["window_stat", "across_stat", "num_seg", "inc_move"],
                  [{"window_stat": ["mean", "std"], "across_stat": "std",
                    "num_seg": [2, 5, 10], "inc_move": [1, 2], "zscore": True}]),
        Operation(K.trend, "SY_Trend", configs=[{"zscore": True}]),
        Operation(K.std_nth_der, "SY_StdNthDer", ["n"],
                  [{"n": [1, 2, 3, 4, 5, 10]}]),
        Operation(K.simple_stats, "SY_SimpleStats", ["what_stat"],
                  [{"what_stat": ["zcross", "maxima", "minima", "pmcross", "zsczcross"],
                    "zscore": True}]),
        Operation(K.drifting_mean, "SY_DriftingMean", ["how", "seg_len"],
                  [{"how": "fix", "seg_len": [20, 50, 100]},
                   {"how": "num", "seg_len": [5, 10]}]),
        Operation(K.local_global, "SY_LocalGlobal", ["subset", "n"],
                  [{"subset": "l", "n": [50, 100], "zscore": True},
                   {"subset": "unicg", "n": [20, 100], "zscore": True}]),
        Operation(K.fit_polynomial, "SY_FitPolynomial", ["k"],
                  [{"k": [1, 2, 3, 4], "zscore": True}]),
        Operation(K.range_evolve, "SY_RangeEvolve", configs=[{"zscore": True}]),
        Operation(K.dyn_win_basic, "SY_DynWin", configs=[{"zscore": True}]),
        Operation(K.moment_corr, "SY_MomentCorr",
                  ["window_length", "w_overlap", "stat1", "stat2"],
                  [{"window_length": 0.02, "w_overlap": 0.2,
                    "stat1": ["mean", "median"], "stat2": ["std", "iqr"]}]),
        Operation(M.kpss_test, "SY_KPSStest", ["lags"],
                  [{"lags": [0, 1, 2]}]),
        Operation(M.variance_ratio_test, "SY_VarRatioTest", ["period"],
                  [{"period": [2, 4]}]),
        # --- Entropy / information ---------------------------------------
        Operation(E.sample_entropy, "EN_SampEn", ["M", "r"],
                  [{"M": 2, "r": [0.1, 0.2], "zscore": True}]),
        Operation(E.approximate_entropy, "EN_ApEn", ["m", "rth"],
                  [{"m": [1, 2], "rth": [0.1, 0.2], "zscore": True}]),
        Operation(E.perm_entropy_ref, "EN_PermEn", ["m", "tau"],
                  [{"m": [2, 3, 4], "tau": [1, 2], "zscore": True}]),
        Operation(E.distribution_entropy, "EN_DistributionEntropy",
                  ["hist_or_ks", "num_bins", "olremp"],
                  [{"hist_or_ks": "hist", "num_bins": [5, 10, 20],
                    "olremp": [0.0, 0.01], "zscore": True},
                   {"hist_or_ks": "ks", "num_bins": 0, "olremp": [0.0, 0.01],
                    "zscore": True}]),
        Operation(E.shannon_entropy_ms, "EN_MS_shannon", ["num_bins", "depth"],
                  [{"num_bins": [2, 3], "depth": [2, 3], "zscore": True}]),
        Operation(E.lz_complexity, "EN_LZcomplexity", ["nbits"],
                  [{"nbits": [2, 3, 5], "zscore": True}]),
        Operation(E.rpde, "EN_rpde", ["m", "tau"],
                  [{"m": 2, "tau": 1, "zscore": True}]),
        Operation(E.multiscale_entropy, "EN_mse", configs=[{"zscore": True}]),
        Operation(K.cid_ce, "EN_CID", configs=[{"zscore": True}]),
        Operation(I.auto_mutual_info, "IN_AutoMutualInfo", ["time_delay"],
                  [{"time_delay": [1, 2, 5], "est_method": "gaussian",
                    "zscore": True}]),
        Operation(I.histogram_ami, "CO_HistogramAMI", ["tau", "meth", "num_bins"],
                  [{"tau": [1, 2], "meth": ["even", "std1", "quantiles"],
                    "num_bins": [5, 10], "zscore": True}]),
        Operation(I.first_min, "CO_FirstMin_mi", ["what"],
                  [{"what": "mi", "zscore": True}]),
        Operation(I.rm_information, "IN_AMInformation", ["tau"],
                  [{"tau": [1, 2, 3], "zscore": True}]),
        # --- Symbolic -----------------------------------------------------
        Operation(K.motif_two, "SB_MotifTwo", ["binarize_how"],
                  [{"binarize_how": ["diff", "mean", "median"], "zscore": True}]),
        Operation(SY.motif_three, "SB_MotifThree", ["cg_how"],
                  [{"cg_how": ["quantile", "diffquant"], "zscore": True}]),
        Operation(SY.transition_matrix, "SB_TransitionMatrix",
                  ["howtocg", "num_groups", "tau"],
                  [{"howtocg": "quantile", "num_groups": [2, 3], "tau": [1],
                    "zscore": True}]),
        Operation(SY.surprise, "FC_Surprise", ["what_prior", "cg_method"],
                  [{"what_prior": ["dist", "T1"], "cg_method": "quantile",
                    "zscore": True}]),
        Operation(SY.binary_stretch, "SB_BinaryStretch", ["stretch_what"],
                  [{"stretch_what": ["lseq1", "lseq0"], "zscore": True}]),
        Operation(K.binary_stats, "SB_BinaryStats", ["binarize_how"],
                  [{"binarize_how": ["diff", "mean", "iqr"], "zscore": True}]),
        # --- Model fitting ------------------------------------------------
        Operation(M.ar_cov, "MF_arcov", ["p"], [{"p": [1, 2, 3], "zscore": True}]),
        Operation(M.ar_fit_select, "MF_ARfit", configs=[{"zscore": True}]),
        Operation(M.exp_smoothing, "MF_ExpSmoothing", configs=[{"zscore": True}]),
        Operation(K.local_simple, "FC_LocalSimple",
                  ["forecast_meth", "train_length"],
                  [{"forecast_meth": ["mean", "median"],
                    "train_length": [1, 2, 3, 4], "zscore": True}]),
        Operation(M.hypothesis_test, "HT_HypothesisTest", ["the_test"],
                  [{"the_test": ["signtest", "runstest", "ztest", "signrank",
                                 "jbtest", "lbq"], "zscore": True}]),
        # --- Criticality / medical --------------------------------------
        Operation(K.rad, "CR_RAD", ["tau"], [{"tau": [1, 2], "zscore": True}]),
        Operation(K.pnn, "MD_pNN", ["threshold"],
                  [{"threshold": [0.05, 0.2, 0.5], "zscore": True}]),
        Operation(MD.hrv_classic, "MD_hrv_classic", configs=[{"zscore": True}]),
        Operation(MD.raw_hrv_meas, "MD_rawHRVmeas", configs=[{}]),
        Operation(MD.pnn_set, "MD_pNN_set", configs=[{"zscore": True}]),
        Operation(MD.polvar, "MD_polvar", ["d", "D"],
                  [{"d": [0.5, 1.0], "D": [3, 6], "zscore": True}]),
        # --- Embedding geometry ------------------------------------------
        Operation(EM.embed2, "CO_Embed2", ["tau"],
                  [{"tau": ["tau"], "zscore": True}]),
        Operation(EM.embed2_angle_tau, "CO_Embed2_AngleTau", ["max_tau"],
                  [{"max_tau": [10], "zscore": True}]),
        Operation(EM.embed2_dist, "CO_Embed2_Dist", configs=[{"zscore": True}]),
        Operation(EM.embed2_shapes, "CO_Embed2_Shapes", ["r"],
                  [{"r": [1.0], "zscore": True}]),
        Operation(EM.stick_angles, "CO_StickAngles", configs=[{"zscore": True}]),
        Operation(EM.translate_shape, "CO_TranslateShape", ["shape", "d"],
                  [{"shape": ["circle", "rectangle"], "d": [1.5, 2.5],
                    "zscore": True}]),
        Operation(EM.autocorr_shape, "CO_AutoCorrShape", configs=[{"zscore": True}]),
        Operation(EM.periodicity_wang, "PD_PeriodicityWang",
                  configs=[{"zscore": True}]),
        # --- Spectral / wavelet -------------------------------------------
        Operation(SP.spectral_summaries, "SP_Summaries", ["psd_meth"],
                  [{"psd_meth": ["fft", "welch"], "zscore": True}]),
        Operation(WL.cwt_features, "WL_cwt", ["wname", "max_scale"],
                  [{"wname": ["db3", "sym2"], "max_scale": 32, "zscore": True}]),
        Operation(WL.detail_coeffs, "WL_DetailCoeffs", ["wname"],
                  [{"wname": ["db3"], "zscore": True}]),
        Operation(WL.wl_coeffs, "WL_coeffs", ["wname", "level"],
                  [{"wname": "db3", "level": [2, 3], "zscore": True}]),
        # --- Physics / scaling / graph ------------------------------------
        Operation(PH.walker, "PH_Walker", ["walker_rule"],
                  [{"walker_rule": ["prop", "momentum"], "zscore": True}]),
        Operation(PH.force_potential, "PH_ForcePotential", ["what_potential"],
                  [{"what_potential": ["dblwell", "sine"], "zscore": True}]),
        Operation(PH.moving_threshold, "EX_MovingThreshold", ["a", "b"],
                  [{"a": [0.1, 1.0], "b": [0.1, 0.02], "zscore": True}]),
        Operation(PH.fast_dfa, "SC_fastdfa", configs=[{"zscore": True}]),
        Operation(PH.visibility_graph, "NW_VisibilityGraph",
                  configs=[{"zscore": True}]),
        # --- Distribution extras ------------------------------------------
        Operation(DX.mean_types, "DN_Mean_types", ["mean_type"],
                  [{"mean_type": ["median", "rms", "iqm", "midhinge"]}]),
        Operation(DX.fit_mle, "DN_Fit_mle", ["fit_what"],
                  [{"fit_what": ["gaussian", "uniform"]}]),
        Operation(DX.pleft, "DN_pleft", ["th"],
                  [{"th": [0.05, 0.1, 0.2], "zscore": True}]),
        Operation(DX.outlier_include, "DN_OutlierInclude", ["threshold_how"],
                  [{"threshold_how": ["abs", "pos", "neg"], "zscore": True}]),
        Operation(DX.outlier_test, "DN_OutlierTest", ["p"],
                  [{"p": [2, 5, 10], "zscore": True}]),
        Operation(DX.remove_points, "DN_RemovePoints",
                  ["remove_how", "p"],
                  [{"remove_how": ["absclose", "absfar", "min", "max"],
                    "p": [0.1, 0.5], "zscore": True}]),
        Operation(DX.histogram_asymmetry, "DN_HistogramAsymmetry",
                  configs=[{"zscore": True}]),
        # --- Stationarity extras -------------------------------------------
        Operation(SX.dyn_win, "SY_DynWin_full", configs=[{"zscore": True}]),
        Operation(SX.local_distributions, "SY_LocalDistributions",
                  ["num_segs", "each_or_par"],
                  [{"num_segs": [4, 5], "each_or_par": ["par", "each"],
                    "zscore": True}]),
        Operation(SX.local_extrema, "SY_LocalExtrema", ["how_to_window", "n"],
                  [{"how_to_window": "l", "n": [50, 100], "zscore": True},
                   {"how_to_window": "n", "n": [5], "zscore": True}]),
        Operation(SX.preproc_compare, "PP_Compare", ["detrend_meth"],
                  [{"detrend_meth": ["diff1", "medianf3", "rav4", "poly1", "poly2"],
                    "zscore": True}]),
    ]


_CACHE: dict[int, FeatureSet] = {}


def default_feature_set(probe_len: int = 256) -> FeatureSet:
    if probe_len not in _CACHE:
        _CACHE[probe_len] = FeatureSet(expand(default_operations()), probe_len)
    return _CACHE[probe_len]
