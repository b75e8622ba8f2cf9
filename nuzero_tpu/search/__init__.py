from nuzero_tpu.search.mcts import SearchParams, SearchResults, make_search_fn

__all__ = ["SearchParams", "SearchResults", "make_search_fn"]
