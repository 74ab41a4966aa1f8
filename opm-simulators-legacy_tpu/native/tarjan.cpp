// Host graph kernels for the reordering transport solvers and flow
// diagnostics: Tarjan strongly-connected components over the upwind flux
// graph, reverse-topological component ordering, and wavefront level
// assignment.
//
// Re-implements the capability of the reference's C kernels
// /root/reference/opm/core/transport/reorder/tarjan.c and
// reordersequence.cpp:36-100 with a different algorithm surface: besides the
// sequence, it emits LEVELS of the condensation DAG so the TPU solvers can
// batch all cells of a level into one vmapped solve (wavefront scheduling)
// instead of the reference's serial cell-by-cell sweep
// (ReorderSolverInterface.cpp:30-64).
//
// Exposed with a plain C ABI for ctypes. Build: native/Makefile.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Iterative Tarjan SCC.
//  ia/ja: CSR adjacency (edge u -> v means u is UPSTREAM of v).
//  Outputs:
//    comp[n]      : SCC id per node; ids are numbered so that following any
//                   edge never decreases the topological order of SCCs.
//    order[n]     : nodes sorted by (level, comp) — the solve sequence.
//    comp_of[n]   : comp id per node (same as comp; kept for clarity).
//    level[n]     : wavefront level of the node's SCC (0 = no upstream).
//    comp_size[n] : size of each SCC (first ncomp entries valid).
//  Returns ncomp.
int64_t tarjan_levels(int64_t n, const int64_t* ia, const int64_t* ja,
                      int64_t* comp, int64_t* order, int64_t* level,
                      int64_t* comp_size) {
    std::vector<int64_t> low(n, -1), disc(n, -1), stk;
    std::vector<uint8_t> on_stack(n, 0);
    std::vector<int64_t> call_node, call_edge;  // explicit DFS stack
    stk.reserve(n);
    int64_t time = 0, ncomp = 0;
    std::fill(comp, comp + n, int64_t(-1));

    for (int64_t s = 0; s < n; ++s) {
        if (disc[s] != -1) continue;
        call_node.clear();
        call_edge.clear();
        call_node.push_back(s);
        call_edge.push_back(ia[s]);
        disc[s] = low[s] = time++;
        stk.push_back(s);
        on_stack[s] = 1;
        while (!call_node.empty()) {
            int64_t u = call_node.back();
            int64_t& e = call_edge.back();
            if (e < ia[u + 1]) {
                int64_t v = ja[e++];
                if (disc[v] == -1) {
                    disc[v] = low[v] = time++;
                    stk.push_back(v);
                    on_stack[v] = 1;
                    call_node.push_back(v);
                    call_edge.push_back(ia[v]);
                } else if (on_stack[v] && disc[v] < low[u]) {
                    low[u] = disc[v];
                }
            } else {
                if (low[u] == disc[u]) {
                    // pop an SCC
                    while (true) {
                        int64_t w = stk.back();
                        stk.pop_back();
                        on_stack[w] = 0;
                        comp[w] = ncomp;
                        if (w == u) break;
                    }
                    ++ncomp;
                }
                call_node.pop_back();
                call_edge.pop_back();
                if (!call_node.empty()) {
                    int64_t p = call_node.back();
                    if (low[u] < low[p]) low[p] = low[u];
                }
            }
        }
    }
    // Tarjan emits SCCs in REVERSE topological order of the condensation
    // (an SCC is completed only after everything it reaches): edge u->v
    // implies comp[u] >= comp[v] — but we want upstream-first. Renumber:
    // topo id = ncomp - 1 - tarjan id gives upstream SCCs smaller ids.
    for (int64_t i = 0; i < n; ++i) comp[i] = ncomp - 1 - comp[i];

    // wavefront levels on the condensation DAG
    std::vector<int64_t> clevel(ncomp, 0);
    std::fill(comp_size, comp_size + n, 0);
    for (int64_t i = 0; i < n; ++i) comp_size[comp[i]]++;
    // process nodes in increasing comp id (topological): relax edges
    // levels: level(Cv) >= level(Cu) + 1 for edge u->v across components
    std::vector<int64_t> node_by_comp(n);
    {
        std::vector<int64_t> off(ncomp + 1, 0);
        for (int64_t c = 0; c < ncomp; ++c) off[c + 1] = off[c] + comp_size[c];
        std::vector<int64_t> pos(off.begin(), off.end() - 1);
        for (int64_t i = 0; i < n; ++i) node_by_comp[pos[comp[i]]++] = i;
    }
    for (int64_t idx = 0; idx < n; ++idx) {
        int64_t u = node_by_comp[idx];
        for (int64_t e = ia[u]; e < ia[u + 1]; ++e) {
            int64_t v = ja[e];
            if (comp[v] != comp[u]) {
                int64_t cand = clevel[comp[u]] + 1;
                if (cand > clevel[comp[v]]) clevel[comp[v]] = cand;
            }
        }
    }
    for (int64_t i = 0; i < n; ++i) level[i] = clevel[comp[i]];

    // order: nodes sorted by (level, comp id) — stable counting sort
    {
        std::vector<std::pair<int64_t, int64_t>> keys(n);
        for (int64_t i = 0; i < n; ++i)
            keys[i] = {level[i] * (ncomp + 1) + comp[i], i};
        std::sort(keys.begin(), keys.end());
        for (int64_t i = 0; i < n; ++i) order[i] = keys[i].second;
    }
    return ncomp;
}

// Build the upwind CSR adjacency from signed face fluxes
// (reordersequence.cpp:36-100 semantics): face f with flux > tol adds edge
// c1 -> c2 (c1 upstream), flux < -tol adds c2 -> c1.
// ia must have n+1 slots, ja nf slots. Returns number of edges.
int64_t upwind_graph(int64_t n, int64_t nf, const int64_t* c1,
                     const int64_t* c2, const double* flux, double tol,
                     int64_t* ia, int64_t* ja) {
    std::vector<int64_t> deg(n, 0);
    for (int64_t f = 0; f < nf; ++f) {
        if (flux[f] > tol) deg[c1[f]]++;
        else if (flux[f] < -tol) deg[c2[f]]++;
    }
    ia[0] = 0;
    for (int64_t i = 0; i < n; ++i) ia[i + 1] = ia[i] + deg[i];
    std::vector<int64_t> pos(ia, ia + n);
    for (int64_t f = 0; f < nf; ++f) {
        if (flux[f] > tol) ja[pos[c1[f]]++] = c2[f];
        else if (flux[f] < -tol) ja[pos[c2[f]]++] = c1[f];
    }
    return ia[n];
}

}  // extern "C"
