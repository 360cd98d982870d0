from .faiss_io import read_faiss_index, write_ivf_flat_index, FaissIndex  # noqa: F401
from .knn import Retriever  # noqa: F401
