package geomesaspark.ext;

import java.util.ArrayList;
import java.util.List;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Cast;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.In;
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.PythonUDF;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.types.DataTypes;

/**
 * Catalyst optimizer rule: bbox-prefilter injection for exact spatial
 * refinement UDFs — the JVM-side analog of the reference's
 * SQLRules.STIntersectsRule / STContainsRule (reference:
 * geomesa-spark/geomesa-spark-sql/src/main/scala/org/apache/spark/sql/
 * SQLRules.scala:36-141, which intercepts Filter(st_* predicate) plans and
 * replaces the relation with an index-range scan, keeping the exact
 * predicate as a post-filter).
 *
 * Rewrite: a Filter whose condition contains one of the Arrow-batched
 * Python refine UDFs
 *   st_pip_wkt(lon, lat, 'POLYGON (...)')            (exact point-in-polygon)
 *   st_dwithin_pt(lon, lat, lon0, lat0, meters)      (exact haversine radius)
 *   st_intersects_wkb(geom, 'POLYGON (...)')         (exact DE-9IM intersects
 *                                                     over a WKB geometry col)
 * gains native conjuncts
 *   lon >= minx AND lon <= maxx AND lat >= miny AND lat <= maxy
 * (point UDFs), or for the geometry-column form — when the table carries
 * the materialized bbox columns {geom}_xmin/_xmax/_ymin/_ymax written by
 * geomesa_spark.extensions.with_bbox_columns (the XZ-storage analog,
 * reference geomesa-spark-sql SQLRules.scala:36-141 which translates
 * non-point geometry predicates to index scans) —
 *   geom_xmin <= qmaxx AND geom_xmax >= qminx AND
 *   geom_ymin <= qmaxy AND geom_ymax >= qminy
 * derived from the WKT literal's bounding box (pip/intersects) or from the radius's
 * latitude-corrected degree box (dwithin — the same conservative
 * worst-case-latitude scale as core.geometry.buffer_point_deg, so the box
 * always contains the true geodesic disc; skipped entirely when the box
 * would wrap the antimeridian, where a plain range pair is not a necessary
 * condition). Either way the injected box is a NECESSARY condition of the
 * exact predicate, so results are unchanged. Catalyst's own
 * PushDownPredicates then moves those conjuncts through the plan to the
 * file scan (PushedFilters + row-group pruning), so the slow exact UDF only
 * ever sees bbox survivors: the index-prefilter + exact-refine shape the
 * engine's DataFrame API builds explicitly (operators/spatial_join.py),
 * here recovered automatically from a user's plain spark.sql(...) query.
 *
 * Cell injection (the reference's index-range-scan analog,
 * SQLRules.scala:216-254): when the session confs
 * spark.geomesaspark.cell.{column,res} are set (see CELL_COL_KEY), the
 * point UDFs additionally gain `cellCol IN (<Z2 cells covering the query
 * box>)` — on a table partitioned by that column (sources/storage.py
 * CompositeScheme) Catalyst turns the conjunct into a PartitionFilter,
 * pruning whole directories where bbox ranges alone only prune row groups.
 *
 * Idempotence (the rule runs in a fixed-point batch): injection is skipped
 * when semantically-equal conjuncts already exist in this Filter OR in any
 * descendant Filter — after PushDownPredicates splits the rewritten Filter,
 * the re-visited UDF-only Filter sees its bbox conjuncts below and leaves
 * the plan unchanged, so the batch converges.
 */
public class BBoxPrefilterRule extends Rule<LogicalPlan> {

  /** UDF names this rule recognizes (registered by
   *  geomesa_spark.extensions.register_st_pip_wkt / register_st_dwithin_pt /
   *  register_st_intersects_wkb). Matched by EXACT name + arity: a user UDF
   *  that merely shares the prefix (st_pip_wkt_custom) is never touched. */
  static final String PIP_NAME = "st_pip_wkt";
  static final String DWITHIN_NAME = "st_dwithin_pt";
  static final String INTERSECTS_NAME = "st_intersects_wkb";

  /** Suffixes of the materialized bbox columns written by
   *  geomesa_spark.extensions.with_bbox_columns — the XZ-storage analog for
   *  non-point geometry columns: parquet keeps min/max stats per row group
   *  for plain double columns, so range conjuncts on them prune IO where a
   *  conjunct on the opaque WKB binary column could not. */
  static final String[] BBOX_SUFFIXES = {"_xmin", "_xmax", "_ymin", "_ymax"};

  /** Engine constants mirrored from geomesa_spark.core.geometry
   *  (buffer_point_deg) so the injected box matches the Python planner's
   *  prefilter exactly. */
  static final double EARTH_RADIUS_M = 6371008.8;

  /** Session confs activating cell-IN-list injection (the index-range-scan
   *  analog of the reference's relation replacement, SQLRules.scala:216-254):
   *  when `.column` names a LongType attribute in the Filter child's output
   *  and `.res` gives its Z2 resolution, point UDFs additionally gain
   *  `cellCol IN (<cells covering the query bbox>)`. On a table
   *  partitioned by that column (sources/storage.py CompositeScheme) the
   *  conjunct becomes a PartitionFilter — directory-level pruning the bbox
   *  ranges alone cannot give. CONTRACT (asserted by setting the confs,
   *  same trust class as the {geom}_xmin bbox-column contract): the named
   *  column equals core.cells.encode(lon, lat, res) of the coordinate
   *  columns the spatial UDFs receive; geomesa_spark.extensions.
   *  with_point_cell_column writes exactly that. As a structural guard the
   *  rule only injects when the UDF's lon/lat are BARE column references,
   *  and — because the confs are session-global while the contract is
   *  per-table — when `.lonColumn`/`.latColumn` are set (the Python helper
   *  always sets them) the UDF's argument names must equal them: a second
   *  table carrying a same-named cell column over DIFFERENT coordinate
   *  columns is then never pruned with the wrong cover. Two tables sharing
   *  all three names but different resolutions remain the caller's
   *  responsibility: one cell layout per session (or distinct column
   *  names per layout, e.g. p_cell_r8 / p_cell_r10). */
  static final String CELL_COL_KEY = "spark.geomesaspark.cell.column";
  static final String CELL_RES_KEY = "spark.geomesaspark.cell.res";
  static final String CELL_MAX_KEY = "spark.geomesaspark.cell.maxCells";
  static final String CELL_LON_KEY = "spark.geomesaspark.cell.lonColumn";
  static final String CELL_LAT_KEY = "spark.geomesaspark.cell.latColumn";

  private static final Pattern NUM =
      Pattern.compile("[-+]?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?");

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    return transform(plan);
  }

  private LogicalPlan transform(LogicalPlan node) {
    List<LogicalPlan> kids = new ArrayList<>();
    boolean changed = false;
    scala.collection.Iterator<LogicalPlan> it = node.children().iterator();
    while (it.hasNext()) {
      LogicalPlan child = it.next();
      LogicalPlan t = transform(child);
      changed |= (t != child);
      kids.add(t);
    }
    LogicalPlan out = changed
        ? (LogicalPlan) node.withNewChildren(
            scala.jdk.javaapi.CollectionConverters.asScala(kids).toSeq())
        : node;
    if (out instanceof Filter) {
      Filter f = (Filter) out;
      List<Expression> existing = new ArrayList<>();
      collectConjuncts(f.condition(), existing);
      collectDescendantConjuncts(f.child(), existing);
      Expression cond = f.condition();
      List<PythonUDF> udfs = new ArrayList<>();
      collectUdfs(cond, udfs);
      for (PythonUDF udf : udfs) {
        Expression[] ranges = udf.name().equals(INTERSECTS_NAME)
            ? intersectsConjuncts(udf, f)
            : pointConjuncts(udf, f);
        if (ranges == null) {
          continue;
        }
        for (Expression r : ranges) {
          if (!containsSemantically(existing, r)) {
            cond = new And(r, cond);
            existing.add(r);
          }
        }
      }
      if (cond != f.condition()) {
        return new Filter(cond, f.child());
      }
    }
    return out;
  }

  private static Literal lit(double v) {
    return new Literal(v, DataTypes.DoubleType);
  }

  /** lon/lat range conjuncts for the point-column UDFs (pip / dwithin), or
   *  null when no box can be derived. The coordinate child expressions are
   *  DUPLICATED into the conjuncts, so injection requires them
   *  deterministic — Catalyst's own pushdown guard: a non-deterministic
   *  coordinate would evaluate differently in the conjunct vs the UDF. */
  private Expression[] pointConjuncts(PythonUDF udf, Filter f) {
    double[] bbox = udf.name().equals(DWITHIN_NAME)
        ? dwithinBBox(udf)
        : wktBBox(udf);
    if (bbox == null) {
      return null;
    }
    Expression lon = udf.children().apply(0);
    Expression lat = udf.children().apply(1);
    if (!lon.deterministic() || !lat.deterministic()) {
      return null;
    }
    List<Expression> out = new ArrayList<>();
    out.add(new GreaterThanOrEqual(lon, lit(bbox[0])));
    out.add(new LessThanOrEqual(lon, lit(bbox[1])));
    out.add(new GreaterThanOrEqual(lat, lit(bbox[2])));
    out.add(new LessThanOrEqual(lat, lit(bbox[3])));
    Expression cellIn = cellConjunct(udf, f, bbox);
    if (cellIn != null) {
      out.add(cellIn);
    }
    return out.toArray(new Expression[0]);
  }

  /** `cellCol IN (<level-res Z2 cells covering bbox>)` when the session
   *  confs are set, the column resolves as a LongType attribute of the
   *  Filter child, and the UDF's lon/lat are bare column references (the
   *  cell-column contract is per-table, so derived coordinate expressions
   *  disqualify). The cover is every grid cell whose lon/lat bin range
   *  overlaps the query box under core.cells.xy_of's exact floor+clamp
   *  binning, so membership is a NECESSARY condition of the bbox (and hence
   *  of the exact predicate). Null when the cover exceeds `.maxCells` —
   *  a too-coarse cap costs nothing (the bbox ranges still inject). */
  private Expression cellConjunct(PythonUDF udf, Filter f, double[] bbox) {
    String col = conf().getConfString(CELL_COL_KEY, "");
    if (col.isEmpty()) {
      return null;
    }
    int res;
    long maxCells;
    try {
      res = Integer.parseInt(conf().getConfString(CELL_RES_KEY, ""));
      maxCells = Long.parseLong(conf().getConfString(CELL_MAX_KEY, "2048"));
    } catch (NumberFormatException nfe) {
      return null;
    }
    if (res < 0 || res > 30
        || !(udf.children().apply(0) instanceof AttributeReference)
        || !(udf.children().apply(1) instanceof AttributeReference)) {
      return null;
    }
    // per-table guard over the session-global conf: when the coordinate
    // column names are registered, the UDF must be filtering exactly them
    String lonCol = conf().getConfString(CELL_LON_KEY, "");
    String latCol = conf().getConfString(CELL_LAT_KEY, "");
    if (!lonCol.isEmpty()
        && !((AttributeReference) udf.children().apply(0))
            .name().equalsIgnoreCase(lonCol)) {
      return null;
    }
    if (!latCol.isEmpty()
        && !((AttributeReference) udf.children().apply(1))
            .name().equalsIgnoreCase(latCol)) {
      return null;
    }
    // IntegerType too: hive-style partition discovery infers int for a
    // partitionBy(cell) directory column whose values fit — the exact
    // layout this injection exists to prune
    Attribute cell = null;
    scala.collection.Iterator<Attribute> it = f.child().output().iterator();
    while (it.hasNext()) {
      Attribute a = it.next();
      if (a.name().equalsIgnoreCase(col)
          && (a.dataType() == DataTypes.LongType
              || a.dataType() == DataTypes.IntegerType)) {
        cell = a;
      }
    }
    if (cell == null) {
      return null;
    }
    long n = 1L << res;
    long ix0 = gridBin(bbox[0], -180.0, 360.0, n, false);
    long ix1 = gridBin(bbox[1], -180.0, 360.0, n, true);
    long iy0 = gridBin(bbox[2], -90.0, 180.0, n, false);
    long iy1 = gridBin(bbox[3], -90.0, 180.0, n, true);
    if ((ix1 - ix0 + 1) * (iy1 - iy0 + 1) > maxCells) {
      return null;
    }
    boolean isInt = cell.dataType() == DataTypes.IntegerType;
    List<Expression> lits = new ArrayList<>();
    for (long x = ix0; x <= ix1; x++) {
      for (long y = iy0; y <= iy1; y++) {
        long v = spread(x) | (spread(y) << 1);
        if (isInt && v > Integer.MAX_VALUE) {
          continue;  // an int column cannot hold this cell: no row matches
        }
        lits.add(isInt
            ? new Literal((int) v, DataTypes.IntegerType)
            : new Literal(v, DataTypes.LongType));
      }
    }
    if (lits.isEmpty()) {
      return null;
    }
    return new In(
        cell, scala.jdk.javaapi.CollectionConverters.asScala(lits).toSeq());
  }

  /** Conservative bin of a query-box corner, clamped into [0, n-1]
   *  (BitNormalizedDimension, reference NormalizedDimension.scala:56-72).
   *  The engine has two bit-compatible-in-spirit but IEEE-distinct writers:
   *  cells.cell_sql_expr computes floor((v - min) * n / extent) and
   *  cells.xy_of computes floor((v - min) / extent * n) — the two orders can
   *  disagree by one ulp-driven bin at cell boundaries. The cover corner
   *  takes the outer (min for low / max for high) of BOTH orders, so the
   *  IN list is a necessary condition under either writer. */
  private static long gridBin(
      double v, double min, double extent, long n, boolean high) {
    long a = (long) Math.floor((v - min) * n / extent);
    long b = (long) Math.floor((v - min) / extent * n);
    long i = high ? Math.max(a, b) : Math.min(a, b);
    return Math.min(Math.max(i, 0L), n - 1L);
  }

  /** Morton spread of the low 30 bits onto even positions —
   *  core.cells._spread's masks exactly. */
  private static long spread(long v) {
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL;
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL;
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL;
    v = (v | (v << 2)) & 0x3333333333333333L;
    v = (v | (v << 1)) & 0x5555555555555555L;
    return v;
  }

  /** Bbox-overlap conjuncts for st_intersects_wkb(geomCol, 'WKT') over a
   *  WKB geometry COLUMN: requires the table to carry the materialized
   *  bbox columns `{geom}_xmin/_xmax/_ymin/_ymax` (written by
   *  with_bbox_columns) in the Filter child's output. Injects
   *    g_xmin <= qmaxx AND g_xmax >= qminx AND
   *    g_ymin <= qmaxy AND g_ymax >= qminy
   *  — bbox overlap is a necessary condition of intersects, so results are
   *  unchanged; the plain double ranges then push to the parquet scan
   *  where the opaque WKB binary column never could. Null (no injection)
   *  when the geometry argument is not a bare column, the WKT argument is
   *  not a foldable string, or any bbox sibling is missing / non-double. */
  private static Expression[] intersectsConjuncts(PythonUDF udf, Filter f) {
    if (udf.children().size() != 2
        || !(udf.children().apply(0) instanceof AttributeReference)) {
      return null;
    }
    AttributeReference geom = (AttributeReference) udf.children().apply(0);
    double[] q = wktBBoxOf(udf.children().apply(1));
    if (q == null) {
      return null;
    }
    Attribute[] cols = new Attribute[4];
    scala.collection.Iterator<Attribute> it = f.child().output().iterator();
    while (it.hasNext()) {
      Attribute a = it.next();
      for (int i = 0; i < 4; i++) {
        if (a.name().equalsIgnoreCase(geom.name() + BBOX_SUFFIXES[i])
            && a.dataType() == DataTypes.DoubleType) {
          cols[i] = a;
        }
      }
    }
    for (Attribute c : cols) {
      if (c == null) {
        return null;
      }
    }
    return new Expression[] {
      new LessThanOrEqual(cols[0], lit(q[1])),      // g_xmin <= q.maxx
      new GreaterThanOrEqual(cols[1], lit(q[0])),   // g_xmax >= q.minx
      new LessThanOrEqual(cols[2], lit(q[3])),      // g_ymin <= q.maxy
      new GreaterThanOrEqual(cols[3], lit(q[2])),   // g_ymax >= q.miny
    };
  }

  private static boolean containsSemantically(
      List<Expression> have, Expression want) {
    for (Expression e : have) {
      if (e.semanticEquals(want)) {
        return true;
      }
    }
    return false;
  }

  /** Split nested ANDs into conjuncts. */
  private static void collectConjuncts(Expression e, List<Expression> out) {
    if (e instanceof And) {
      collectConjuncts(((And) e).left(), out);
      collectConjuncts(((And) e).right(), out);
    } else {
      out.add(e);
    }
  }

  /** Conjuncts of every Filter below (where PushDownPredicates leaves the
   *  injected ranges once it splits them out of the rewritten Filter). */
  private static void collectDescendantConjuncts(
      LogicalPlan p, List<Expression> out) {
    if (p instanceof Filter) {
      collectConjuncts(((Filter) p).condition(), out);
    }
    scala.collection.Iterator<LogicalPlan> it = p.children().iterator();
    while (it.hasNext()) {
      collectDescendantConjuncts(it.next(), out);
    }
  }

  private static void collectUdfs(Expression e, List<PythonUDF> out) {
    if (e instanceof PythonUDF) {
      PythonUDF u = (PythonUDF) e;
      if ((u.name().equals(PIP_NAME) && u.children().size() == 3)
          || (u.name().equals(DWITHIN_NAME) && u.children().size() == 5)
          || (u.name().equals(INTERSECTS_NAME)
              && u.children().size() == 2)) {
        out.add(u);
        return;
      }
    }
    scala.collection.Iterator<Expression> it = e.children().iterator();
    while (it.hasNext()) {
      collectUdfs(it.next(), out);
    }
  }

  /** Strip analyzer-inserted casts (an int literal radius arrives as
   *  Cast(Literal, double)). */
  private static Expression unwrapCast(Expression e) {
    while (e instanceof Cast) {
      e = ((Cast) e).child();
    }
    return e;
  }

  private static Double numericLiteral(Expression e) {
    e = unwrapCast(e);
    if (!(e instanceof Literal) || ((Literal) e).value() == null) {
      return null;
    }
    Object v = ((Literal) e).value();
    if (v instanceof Number) {
      return ((Number) v).doubleValue();
    }
    // SQL decimal literals carry org.apache.spark.sql.types.Decimal,
    // which is not a java.lang.Number — parse the canonical string form
    try {
      return Double.parseDouble(v.toString());
    } catch (NumberFormatException nfe) {
      return null;
    }
  }

  /** {minx, maxx, miny, maxy} of the latitude-corrected degree box around
   *  (lon0, lat0) at `meters` — buffer_point_deg's worst-case-latitude
   *  scale, so the box contains the true geodesic disc. Null when any
   *  argument is non-literal or the box would wrap the antimeridian. */
  private static double[] dwithinBBox(PythonUDF udf) {
    Double lon0 = numericLiteral(udf.children().apply(2));
    Double lat0 = numericLiteral(udf.children().apply(3));
    Double meters = numericLiteral(udf.children().apply(4));
    if (lon0 == null || lat0 == null || meters == null || meters < 0) {
      return null;
    }
    double dlat = Math.toDegrees(meters / EARTH_RADIUS_M);
    double worstLat = Math.min(Math.abs(lat0) + dlat, 89.999999);
    double dlon = dlat / Math.max(Math.cos(Math.toRadians(worstLat)), 1e-6);
    if (lon0 - dlon < -180.0 || lon0 + dlon > 180.0) {
      return null;  // wrapping box: a plain range pair over-prunes
    }
    return new double[] {
      lon0 - dlon,
      lon0 + dlon,
      Math.max(lat0 - dlat, -90.0),
      Math.min(lat0 + dlat, 90.0),
    };
  }

  /** {minx, maxx, miny, maxy} of the pip UDF's WKT string literal
   *  (third argument). */
  private static double[] wktBBox(PythonUDF udf) {
    return wktBBoxOf(udf.children().apply(2));
  }

  /** {minx, maxx, miny, maxy} of a WKT string-literal expression, or null
   *  if it is not a foldable string / has no coordinates. WKT coordinates
   *  alternate lon lat, so the numeric scan's even indexes are X and odd
   *  indexes are Y for any (MULTI)POLYGON literal. */
  private static double[] wktBBoxOf(Expression raw) {
    Expression arg = unwrapCast(raw);
    if (!(arg instanceof Literal) || ((Literal) arg).value() == null) {
      return null;
    }
    String wkt = ((Literal) arg).value().toString();
    Matcher m = NUM.matcher(wkt);
    double minx = Double.POSITIVE_INFINITY;
    double maxx = Double.NEGATIVE_INFINITY;
    double miny = Double.POSITIVE_INFINITY;
    double maxy = Double.NEGATIVE_INFINITY;
    int i = 0;
    while (m.find()) {
      double v = Double.parseDouble(m.group());
      if (i % 2 == 0) {
        minx = Math.min(minx, v);
        maxx = Math.max(maxx, v);
      } else {
        miny = Math.min(miny, v);
        maxy = Math.max(maxy, v);
      }
      i++;
    }
    if (i < 6 || i % 2 != 0) {
      return null;
    }
    return new double[] {minx, maxx, miny, maxy};
  }
}
