"""Large-scale training-data pipeline operators built on the same engine
substrate (vectorized Arrow UDFs + JVM-side expressions): deduplication
(exact, MinHash-LSH, SimHash), similarity search over embeddings, text
analysis (language-id heuristic, quality scoring, token stats,
fingerprinting) and multimodal column plumbing."""

from .dedup import (connected_components, dedup_groups,  # noqa: F401
                    neardup_dedup,
                    exact_dedup, minhash_signatures, minhash_neardup_pairs,
                    minhash_wordgram_neardup_pairs,
                    minhash_wordgram_signatures, ngram_jaccard_verify,
                    simhash64_md5, simhash_buckets, winnow_neardup_pairs)
from .multimodal import (attach_media_meta, audio_stats,  # noqa: F401
                         decode_and_featurize, decode_avi, decode_bmp,
                         decode_image, decode_png, decode_video_frames,
                         decode_wav, encode_avi_mjpeg, encode_bmp,
                         encode_png, encode_wav, frame_sample, image_stats,
                         media_embeddings, video_frame_stats)
from .gif import GifError, decode_gif, decode_gif_frames, encode_gif  # noqa: F401,E402
from .similarity import (brute_force_topk, cosine_neardup_pairs,  # noqa: F401
                         hyperplane_lsh_signatures, hyperplane_neardup_pairs,
                         ivf_build, ivf_query, ivf_topk)
from .textstats import (fingerprint, lang_id, quality_score,  # noqa: F401
                        repetition_stats, token_stats,
                        winnow_fingerprints)
from .jpeg import JpegError, decode_jpeg, encode_jpeg  # noqa: F401,E402
from .packing import pack_sequences, packing_stats  # noqa: F401,E402
from .sampling import (deterministic_sample, sample_hash,  # noqa: F401,E402
                       stratified_sample)
