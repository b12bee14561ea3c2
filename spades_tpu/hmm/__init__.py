from .io import ProfileHMM, read_hmm
from .align import viterbi_score, align_hmm_to_graph
