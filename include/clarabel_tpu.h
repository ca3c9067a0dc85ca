/* C ABI for the clarabel_tpu solver.
 *
 * Mirrors the reference solver's C-callable surface
 * (reference: src/julia/interface.rs:55-130 — solver_new / solve /
 * get_info / free over an opaque handle, cones as tagged records,
 * settings as JSON) so C / Julia / any-FFI callers can drive the
 * TPU-native solver.  The implementation (native/capi.cpp) embeds
 * CPython; the handle owns a DefaultSolver.
 *
 * Thread safety: calls are serialized on the embedded interpreter's GIL.
 */
#ifndef CLARABEL_TPU_H
#define CLARABEL_TPU_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Cone tags (order matches the reference's ConeEnumJLRS,
 * src/julia/types.rs). */
enum {
    CLARABEL_ZERO_CONE = 0,
    CLARABEL_NONNEGATIVE_CONE = 1,
    CLARABEL_SECOND_ORDER_CONE = 2,
    CLARABEL_EXPONENTIAL_CONE = 3,
    CLARABEL_POWER_CONE = 4,
    CLARABEL_GENPOWER_CONE = 5,
    CLARABEL_PSD_TRIANGLE_CONE = 6,
};

typedef struct {
    uint8_t tag;          /* one of the cone tags above */
    int64_t dim;          /* Zero/Nonneg/SOC/PSD: dimension; GenPow: dim2 */
    double power;         /* Pow: alpha */
    const double *alpha;  /* GenPow: alpha vector (may be NULL otherwise) */
    int64_t nalpha;
} clarabel_cone;

/* Status codes (clarabel_tpu.statuses.SolverStatus values; same taxonomy
 * as reference src/solver/core/solver.rs:19-45). */
enum {
    CLARABEL_UNSOLVED = 0,
    CLARABEL_SOLVED = 1,
    CLARABEL_PRIMAL_INFEASIBLE = 2,
    CLARABEL_DUAL_INFEASIBLE = 3,
    CLARABEL_ALMOST_SOLVED = 4,
    CLARABEL_ALMOST_PRIMAL_INFEASIBLE = 5,
    CLARABEL_ALMOST_DUAL_INFEASIBLE = 6,
    CLARABEL_MAX_ITERATIONS = 7,
    CLARABEL_MAX_TIME = 8,
    CLARABEL_NUMERICAL_ERROR = 9,
    CLARABEL_INSUFFICIENT_PROGRESS = 10,
    CLARABEL_CALLBACK_TERMINATED = 11,
};

typedef struct {
    int32_t status;       /* status code above */
    int32_t iterations;
    double obj_val;
    double obj_val_dual;
    double solve_time;    /* seconds */
    double r_prim;
    double r_dual;
} clarabel_info;

/* Create a solver.
 *   n, m       — variable count / constraint count
 *   Pp/Pi/Px   — upper-triangle P in CSC (colptr[n+1], rowval, nzval)
 *   q          — length n
 *   Ap/Ai/Ax   — A in CSC (m x n)
 *   b          — length m
 *   cones      — array of clarabel_cone records
 *   settings_json — JSON object of DefaultSettings overrides (may be
 *                NULL/empty); an optional "dtype": "float32"|"float64"
 *                key selects the precision regime.
 * Returns an opaque handle, or NULL on error (see clarabel_last_error). */
void *clarabel_new(
    int64_t n, int64_t m,
    const int64_t *Pp, const int64_t *Pi, const double *Px,
    const double *q,
    const int64_t *Ap, const int64_t *Ai, const double *Ax,
    const double *b,
    const clarabel_cone *cones, int64_t ncones,
    const char *settings_json);

/* Solve; writes the user-frame solution into caller buffers x[n], z[m],
 * s[m] (any may be NULL to skip) and fills *info (may be NULL).
 * Returns the status code, or -1 on error. */
int32_t clarabel_solve(void *handle, double *x, double *z, double *s,
                       clarabel_info *info);

/* Data updating (reference: data_updating.rs).  `which` is one of
 * "P", "A", "q", "b"; vals has the full nonzero/vector length.
 * Returns 0 on success, -1 on error. */
int32_t clarabel_update(void *handle, const char *which,
                        const double *vals, int64_t len);

/* Per-iteration termination callback (reference:
 * src/solver/core/callbacks.rs:7-97 — C fn-ptr + user data, checked every
 * iteration).  The info snapshot carries the in-progress scalars
 * (status = CLARABEL_UNSOLVED, solve_time = seconds since solve start).
 * Return nonzero to stop the solve with CLARABEL_CALLBACK_TERMINATED. */
typedef int32_t (*clarabel_termination_callback)(const clarabel_info *info,
                                                 void *user_data);

/* Install (or clear, with cb == NULL) the termination callback.
 * Returns 0 on success, -1 on error. */
int32_t clarabel_set_termination_callback(void *handle,
                                          clarabel_termination_callback cb,
                                          void *user_data);

/* Number of recorded iteration-history rows from the last solve
 * (0 before any solve; -1 on error).  Each row has 9 doubles:
 * pcost, dcost, gap_abs, gap_rel, pres, dres, k/t, mu, step. */
int64_t clarabel_iteration_history_len(void *handle);

/* Copy up to max_rows iteration-history rows (9 doubles each, row-major)
 * into out.  Returns the number of rows written, or -1 on error. */
int64_t clarabel_iteration_history(void *handle, double *out,
                                   int64_t max_rows);

/* Print the hierarchical solve timers to stdout. */
void clarabel_print_timers(void *handle);

/* Destroy the solver handle. */
void clarabel_free(void *handle);

/* Last error message for this thread ("" if none). */
const char *clarabel_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* CLARABEL_TPU_H */
