/**
 * helix-tpu TypeScript DSL — zero-dependency query builder.
 *
 * Mirrors the wire format of the Python SDK (`helix_tpu/dsl.py`) and the
 * reference TS SDK surface (reference: `sdks/typescript/src/dsl.ts`):
 * externally tagged enum JSON, camelCase builder methods, bigint-safe
 * serialization for u64 ids beyond 2^53.
 *
 * Builders encode eagerly: a Traversal holds its wire-format step array.
 */

export type JsonValue =
  | null
  | boolean
  | number
  | bigint
  | string
  | JsonValue[]
  | { [key: string]: JsonValue };

// ---------------------------------------------------------------------------
// JSON serialization (bigint-safe)
// ---------------------------------------------------------------------------

function writeJson(value: JsonValue, pretty: boolean, indent: string): string {
  if (value === null) return "null";
  switch (typeof value) {
    case "boolean":
      return value ? "true" : "false";
    case "number":
      if (!Number.isFinite(value)) {
        throw new Error("non-finite numbers cannot be serialized as JSON");
      }
      return Number.isInteger(value) && Math.abs(value) < 1e21
        ? String(value)
        : JSON.stringify(value);
    case "bigint":
      return value.toString();
    case "string":
      return JSON.stringify(value);
    default:
      break;
  }
  const nl = pretty ? "\n" : "";
  const pad = pretty ? indent + "  " : "";
  const sep = pretty ? ",\n" : ",";
  if (Array.isArray(value)) {
    if (value.length === 0) return "[]";
    const items = value.map((v) => pad + writeJson(v, pretty, pad));
    return `[${nl}${items.join(sep)}${nl}${pretty ? indent : ""}]`;
  }
  const entries = Object.entries(value as { [key: string]: JsonValue });
  if (entries.length === 0) return "{}";
  const body = entries.map(
    ([k, v]) => `${pad}${JSON.stringify(k)}:${pretty ? " " : ""}${writeJson(v, pretty, pad)}`,
  );
  return `{${nl}${body.join(sep)}${nl}${pretty ? indent : ""}}`;
}

export function stringifyJson(value: JsonValue, pretty = false): string {
  return writeJson(value, pretty, "");
}

// ---------------------------------------------------------------------------
// Property values
// ---------------------------------------------------------------------------

export type PropertyValueInput =
  | null
  | boolean
  | number
  | bigint
  | string
  | Uint8Array
  | Date
  | PropertyValueInput[]
  | { [key: string]: PropertyValueInput }
  | Tagged;

interface Tagged {
  readonly __tag: string;
  readonly __value: JsonValue;
}

function tagged(tag: string, value: JsonValue): Tagged {
  return { __tag: tag, __value: value };
}

function isTagged(v: unknown): v is Tagged {
  return typeof v === "object" && v !== null && "__tag" in (v as object);
}

export function encodePropertyValue(value: PropertyValueInput): JsonValue {
  if (isTagged(value)) {
    return value.__tag === "Null" ? "Null" : { [value.__tag]: value.__value };
  }
  if (value === null) return "Null";
  switch (typeof value) {
    case "boolean":
      return { Bool: value };
    case "number":
      return Number.isInteger(value) ? { I64: value } : { F64: value };
    case "bigint":
      return { I64: value };
    case "string":
      return { String: value };
    default:
      break;
  }
  if (value instanceof Date) return { DateTime: value.getTime() };
  if (value instanceof Uint8Array) return { Bytes: Array.from(value) };
  if (Array.isArray(value)) {
    const all = (pred: (v: PropertyValueInput) => boolean) =>
      value.length > 0 && value.every(pred);
    if (all((v) => typeof v === "string")) {
      return { StringArray: value as JsonValue };
    }
    if (all((v) => typeof v === "number" && Number.isInteger(v) || typeof v === "bigint")) {
      return { I64Array: value as JsonValue };
    }
    if (all((v) => typeof v === "number" || typeof v === "bigint")) {
      return { F64Array: (value as number[]).map(Number) };
    }
    return { Array: value.map(encodePropertyValue) };
  }
  const obj: { [key: string]: JsonValue } = {};
  for (const [k, v] of Object.entries(value)) {
    obj[k] = encodePropertyValue(v as PropertyValueInput);
  }
  return { Object: obj };
}

export const PropertyValue = {
  null: tagged("Null", null),
  bool: (v: boolean) => tagged("Bool", v),
  i64: (v: number | bigint) => tagged("I64", v),
  f64: (v: number) => tagged("F64", v),
  f32: (v: number) => tagged("F32", v),
  string: (v: string) => tagged("String", v),
  dateTime: (millis: number) => tagged("DateTime", millis),
  bytes: (v: Uint8Array | number[]) =>
    tagged("Bytes", Array.from(v as number[])),
  i64Array: (v: (number | bigint)[]) => tagged("I64Array", v),
  f64Array: (v: number[]) => tagged("F64Array", v),
  f32Array: (v: number[]) => tagged("F32Array", v),
  stringArray: (v: string[]) => tagged("StringArray", v),
  array: (v: PropertyValueInput[]) =>
    tagged("Array", v.map(encodePropertyValue)),
  object: (v: { [key: string]: PropertyValueInput }) => {
    const out: { [key: string]: JsonValue } = {};
    for (const [k, val] of Object.entries(v)) out[k] = encodePropertyValue(val);
    return tagged("Object", out);
  },
};

// ---------------------------------------------------------------------------
// Expressions
// ---------------------------------------------------------------------------

export class Expr {
  constructor(readonly node: JsonValue) {}

  static prop(name: string): Expr {
    return new Expr({ Property: name });
  }
  static val(value: PropertyValueInput): Expr {
    return new Expr({ Constant: encodePropertyValue(value) });
  }
  static id(): Expr {
    return new Expr("Id");
  }
  static timestamp(): Expr {
    return new Expr("Timestamp");
  }
  static dateTimeNow(): Expr {
    return new Expr("DateTimeNow");
  }
  static param(name: string): Expr {
    return new Expr({ Param: name });
  }
  static case_(
    whenThen: [Predicate, Expr][],
    elseExpr: Expr | null = null,
  ): Expr {
    return new Expr({
      Case: {
        when_then: whenThen.map(([p, e]) => [p.node, e.node]),
        else_expr: elseExpr === null ? null : elseExpr.node,
      },
    });
  }

  private bin(tag: string, other: ExprLike): Expr {
    return new Expr({ [tag]: [this.node, asExpr(other).node] });
  }
  add(other: ExprLike): Expr {
    return this.bin("Add", other);
  }
  sub(other: ExprLike): Expr {
    return this.bin("Sub", other);
  }
  mul(other: ExprLike): Expr {
    return this.bin("Mul", other);
  }
  div(other: ExprLike): Expr {
    return this.bin("Div", other);
  }
  mod(other: ExprLike): Expr {
    return this.bin("Mod", other);
  }
  neg(): Expr {
    return new Expr({ Neg: this.node });
  }
}

export type ExprLike = Expr | ParamRef | PropertyValueInput;

function isExprish(v: unknown): v is Expr | ParamRef {
  return v instanceof Expr || v instanceof ParamRef;
}

function asExpr(value: ExprLike): Expr {
  if (value instanceof Expr) return value;
  if (value instanceof ParamRef) return Expr.param(value.name);
  return Expr.val(value);
}

function asInput(value: ExprLike): JsonValue {
  if (isExprish(value)) return { Expr: asExpr(value).node };
  return { Value: encodePropertyValue(value) };
}

function asBound(value: ExprLike | number): JsonValue {
  if (isExprish(value)) return { Expr: asExpr(value).node };
  if (typeof value === "number" && value >= 0) return { Literal: value };
  return { Expr: Expr.val(value as PropertyValueInput).node };
}

// ---------------------------------------------------------------------------
// Refs
// ---------------------------------------------------------------------------

export type NodeId = number | bigint;

export const NodeRef = {
  all: "All" as JsonValue,
  id: (id: NodeId): JsonValue => ({ Ids: [id] }),
  ids: (ids: NodeId[]): JsonValue => ({ Ids: ids as JsonValue }),
  var_: (name: string): JsonValue => ({ Var: name }),
  param: (name: string): JsonValue => ({ Param: name }),
};

export const EdgeRef = {
  id: (id: NodeId): JsonValue => ({ Ids: [id] }),
  ids: (ids: NodeId[]): JsonValue => ({ Ids: ids as JsonValue }),
  var_: (name: string): JsonValue => ({ Var: name }),
  param: (name: string): JsonValue => ({ Param: name }),
};

function asNodeRef(value: JsonValue | string | NodeId | NodeId[]): JsonValue {
  if (value === "All") return "All";
  if (typeof value === "string") return { Var: value };
  if (typeof value === "number" || typeof value === "bigint") {
    return { Ids: [value] };
  }
  if (Array.isArray(value)) return { Ids: value as JsonValue };
  return value as JsonValue;
}

// ---------------------------------------------------------------------------
// Predicates
// ---------------------------------------------------------------------------

export type CompareOp = "Eq" | "Neq" | "Gt" | "Gte" | "Lt" | "Lte";
export type Order = "Asc" | "Desc";

export class Predicate {
  constructor(readonly node: JsonValue) {}

  private static cmp(tag: string, prop: string, value: ExprLike): Predicate {
    if (isExprish(value)) {
      return new Predicate({ [`${tag}Expr`]: [prop, asExpr(value).node] });
    }
    return new Predicate({ [tag]: [prop, encodePropertyValue(value)] });
  }
  static eq(prop: string, value: ExprLike): Predicate {
    return Predicate.cmp("Eq", prop, value);
  }
  static neq(prop: string, value: ExprLike): Predicate {
    return Predicate.cmp("Neq", prop, value);
  }
  static gt(prop: string, value: ExprLike): Predicate {
    return Predicate.cmp("Gt", prop, value);
  }
  static gte(prop: string, value: ExprLike): Predicate {
    return Predicate.cmp("Gte", prop, value);
  }
  static lt(prop: string, value: ExprLike): Predicate {
    return Predicate.cmp("Lt", prop, value);
  }
  static lte(prop: string, value: ExprLike): Predicate {
    return Predicate.cmp("Lte", prop, value);
  }
  static between(prop: string, lo: ExprLike, hi: ExprLike): Predicate {
    if (isExprish(lo) || isExprish(hi)) {
      return new Predicate({
        BetweenExpr: [prop, asExpr(lo).node, asExpr(hi).node],
      });
    }
    return new Predicate({
      Between: [prop, encodePropertyValue(lo), encodePropertyValue(hi)],
    });
  }
  static hasKey(prop: string): Predicate {
    return new Predicate({ HasKey: prop });
  }
  static isNull(prop: string): Predicate {
    return new Predicate({ IsNull: prop });
  }
  static isNotNull(prop: string): Predicate {
    return new Predicate({ IsNotNull: prop });
  }
  static startsWith(prop: string, prefix: string): Predicate {
    return new Predicate({ StartsWith: [prop, prefix] });
  }
  static endsWith(prop: string, suffix: string): Predicate {
    return new Predicate({ EndsWith: [prop, suffix] });
  }
  static contains(prop: string, needle: string): Predicate {
    return new Predicate({ Contains: [prop, needle] });
  }
  static containsExpr(prop: string, expr: Expr | ParamRef): Predicate {
    return new Predicate({ ContainsExpr: [prop, asExpr(expr).node] });
  }
  static containsParam(prop: string, name: string): Predicate {
    return Predicate.containsExpr(prop, Expr.param(name));
  }
  static isIn(prop: string, values: PropertyValueInput): Predicate {
    return new Predicate({ IsIn: [prop, encodePropertyValue(values)] });
  }
  static isInExpr(prop: string, values: Expr | ParamRef): Predicate {
    return new Predicate({ IsInExpr: [prop, asExpr(values).node] });
  }
  static isInParam(prop: string, name: string): Predicate {
    return Predicate.isInExpr(prop, Expr.param(name));
  }
  static and(predicates: Predicate[]): Predicate {
    return new Predicate({ And: predicates.map((p) => p.node) });
  }
  static or(predicates: Predicate[]): Predicate {
    return new Predicate({ Or: predicates.map((p) => p.node) });
  }
  static not(predicate: Predicate): Predicate {
    return new Predicate({ Not: predicate.node });
  }
  static compare(left: Expr, op: CompareOp, right: Expr): Predicate {
    return new Predicate({
      Compare: { left: left.node, op, right: right.node },
    });
  }
  static eqParam(prop: string, name: string): Predicate {
    return new Predicate({ EqExpr: [prop, { Param: name }] });
  }
  static gtParam(prop: string, name: string): Predicate {
    return new Predicate({ GtExpr: [prop, { Param: name }] });
  }
}

const SOURCE_PREDICATE_TAGS = new Set([
  "Eq", "Neq", "Gt", "Gte", "Lt", "Lte",
  "EqExpr", "NeqExpr", "GtExpr", "GteExpr", "LtExpr", "LteExpr",
  "Between", "BetweenExpr", "HasKey", "StartsWith", "And", "Or",
]);

export class SourcePredicate extends Predicate {
  constructor(node: JsonValue) {
    const tag = typeof node === "string" ? node : Object.keys(node as object)[0];
    if (!SOURCE_PREDICATE_TAGS.has(tag)) {
      throw new Error(`${tag} is not a valid source predicate`);
    }
    super(node);
  }
  static eq(prop: string, value: ExprLike): SourcePredicate {
    return new SourcePredicate(Predicate.eq(prop, value).node);
  }
  static gt(prop: string, value: ExprLike): SourcePredicate {
    return new SourcePredicate(Predicate.gt(prop, value).node);
  }
  static and(predicates: Predicate[]): SourcePredicate {
    return new SourcePredicate({ And: predicates.map((p) => p.node) });
  }
  static or(predicates: Predicate[]): SourcePredicate {
    return new SourcePredicate({ Or: predicates.map((p) => p.node) });
  }
}

// ---------------------------------------------------------------------------
// Projections / index specs / repeat
// ---------------------------------------------------------------------------

export const Projection = {
  property: (source: string, alias?: string): JsonValue => ({
    source,
    alias: alias ?? source,
  }),
  fromEndpoint: (source: string, alias?: string): JsonValue => ({
    source: `$from.${source}`,
    alias: alias ?? `$from.${source}`,
  }),
  toEndpoint: (source: string, alias?: string): JsonValue => ({
    source: `$to.${source}`,
    alias: alias ?? `$to.${source}`,
  }),
  expr: (alias: string, expr: Expr): JsonValue => ({ alias, expr: expr.node }),
};

export const BindingTarget = {
  current: "Current" as JsonValue,
  binding: (name: string): JsonValue => ({ Binding: name }),
};

export const BindingRef = {
  current: (source: string): JsonValue => ({ target: "Current", source }),
  binding: (name: string, source: string): JsonValue => ({
    target: { Binding: name },
    source,
  }),
};

export const BindingProjection = {
  current: (source: string, alias: string): JsonValue => ({
    kind: "Property",
    target: "Current",
    source,
    alias,
  }),
  binding: (name: string, source: string, alias: string): JsonValue => ({
    kind: "Property",
    target: { Binding: name },
    source,
    alias,
  }),
  coalesce: (refs: JsonValue[], alias: string): JsonValue => ({
    kind: "Coalesce",
    refs,
    alias,
  }),
};

export const IndexSpec = {
  nodeEquality: (label: string, property: string): JsonValue => ({
    NodeEquality: { label, property, unique: false },
  }),
  nodeUniqueEquality: (label: string, property: string): JsonValue => ({
    NodeEquality: { label, property, unique: true },
  }),
  nodeRange: (label: string, property: string, direction: Order = "Asc"): JsonValue => ({
    NodeRange:
      direction === "Asc" ? { label, property } : { label, property, direction },
  }),
  edgeEquality: (label: string, property: string): JsonValue => ({
    EdgeEquality: { label, property },
  }),
  edgeRange: (label: string, property: string, direction: Order = "Asc"): JsonValue => ({
    EdgeRange:
      direction === "Asc" ? { label, property } : { label, property, direction },
  }),
  nodeVector: (label: string, property: string, tenantProperty?: string): JsonValue => ({
    NodeVector: tenantProperty
      ? { label, property, tenant_property: tenantProperty }
      : { label, property },
  }),
  nodeText: (label: string, property: string, tenantProperty?: string): JsonValue => ({
    NodeText: tenantProperty
      ? { label, property, tenant_property: tenantProperty }
      : { label, property },
  }),
  edgeVector: (label: string, property: string, tenantProperty?: string): JsonValue => ({
    EdgeVector: tenantProperty
      ? { label, property, tenant_property: tenantProperty }
      : { label, property },
  }),
  edgeText: (label: string, property: string, tenantProperty?: string): JsonValue => ({
    EdgeText: tenantProperty
      ? { label, property, tenant_property: tenantProperty }
      : { label, property },
  }),
};

export type EmitBehavior = "None" | "Before" | "After" | "All";

export class RepeatConfig {
  private timesValue: number | null = null;
  private untilValue: Predicate | null = null;
  private emitValue: EmitBehavior = "None";
  private emitPredicate: Predicate | null = null;
  private maxDepthValue = 100;

  constructor(private traversal: SubTraversal) {}

  times(n: number): this {
    this.timesValue = n;
    return this;
  }
  until(p: Predicate): this {
    this.untilValue = p;
    return this;
  }
  emitAll(): this {
    this.emitValue = "All";
    return this;
  }
  emitBefore(): this {
    this.emitValue = "Before";
    return this;
  }
  emitAfter(): this {
    this.emitValue = "After";
    return this;
  }
  emitIf(p: Predicate): this {
    this.emitValue = "After";
    this.emitPredicate = p;
    return this;
  }
  maxDepth(depth: number): this {
    this.maxDepthValue = depth;
    return this;
  }
  encode(): JsonValue {
    return {
      traversal: { steps: this.traversal.steps.slice() },
      times: this.timesValue,
      until: this.untilValue === null ? null : this.untilValue.node,
      emit: this.emitValue,
      emit_predicate:
        this.emitPredicate === null ? null : this.emitPredicate.node,
      max_depth: this.maxDepthValue,
    };
  }
}

// ---------------------------------------------------------------------------
// Traversals
// ---------------------------------------------------------------------------

type PropEntries =
  | { [key: string]: ExprLike }
  | [string, ExprLike][];

function propEntries(properties?: PropEntries): JsonValue[] {
  if (!properties) return [];
  const entries = Array.isArray(properties)
    ? properties
    : Object.entries(properties);
  return entries.map(([k, v]) => [k, asInput(v)] as JsonValue);
}

abstract class Steps<Self> {
  steps: JsonValue[] = [];

  protected abstract push(step: JsonValue): Self;

  out(label: string | null = null): Self {
    return this.push({ Out: label });
  }
  in_(label: string | null = null): Self {
    return this.push({ In: label });
  }
  both(label: string | null = null): Self {
    return this.push({ Both: label });
  }
  outE(label: string | null = null): Self {
    return this.push({ OutE: label });
  }
  inE(label: string | null = null): Self {
    return this.push({ InE: label });
  }
  bothE(label: string | null = null): Self {
    return this.push({ BothE: label });
  }
  outN(): Self {
    return this.push("OutN");
  }
  inN(): Self {
    return this.push("InN");
  }
  otherN(): Self {
    return this.push("OtherN");
  }
  has(prop: string, value: PropertyValueInput): Self {
    return this.push({ Has: [prop, encodePropertyValue(value)] });
  }
  hasLabel(label: string): Self {
    return this.push({ HasLabel: label });
  }
  hasKey(prop: string): Self {
    return this.push({ HasKey: prop });
  }
  where(predicate: Predicate): Self {
    return this.push({ Where: predicate.node });
  }
  dedup(): Self {
    return this.push("Dedup");
  }
  within(name: string): Self {
    return this.push({ Within: name });
  }
  without(name: string): Self {
    return this.push({ Without: name });
  }
  edgeHas(prop: string, value: ExprLike): Self {
    return this.push({ EdgeHas: [prop, asInput(value)] });
  }
  edgeHasLabel(label: string): Self {
    return this.push({ EdgeHasLabel: label });
  }
  limit(n: ExprLike | number): Self {
    const bound = asBound(n);
    return typeof bound === "object" && "Literal" in (bound as object)
      ? this.push({ Limit: (bound as { Literal: number }).Literal })
      : this.push({ LimitBy: (bound as { Expr: JsonValue }).Expr });
  }
  skip(n: ExprLike | number): Self {
    const bound = asBound(n);
    return typeof bound === "object" && "Literal" in (bound as object)
      ? this.push({ Skip: (bound as { Literal: number }).Literal })
      : this.push({ SkipBy: (bound as { Expr: JsonValue }).Expr });
  }
  range(start: ExprLike | number, end: ExprLike | number): Self {
    const lo = asBound(start);
    const hi = asBound(end);
    const lit = (b: JsonValue) =>
      typeof b === "object" && b !== null && "Literal" in (b as object);
    if (lit(lo) && lit(hi)) {
      return this.push({
        Range: [
          (lo as { Literal: number }).Literal,
          (hi as { Literal: number }).Literal,
        ],
      });
    }
    return this.push({ RangeBy: [lo, hi] });
  }
  orderBy(prop: string, order: Order = "Asc"): Self {
    return this.push({ OrderBy: [prop, order] });
  }
  orderByMultiple(orderings: [string, Order][]): Self {
    return this.push({ OrderByMultiple: orderings as JsonValue });
  }
  as_(name: string): Self {
    return this.push({ As: name });
  }
  store(name: string): Self {
    return this.push({ Store: name });
  }
  select(name: string): Self {
    return this.push({ Select: name });
  }
  bind(name: string): Self {
    if (!name) throw new Error("binding name must not be empty");
    return this.push({ Bind: name });
  }
  fold(): Self {
    return this.push("Fold");
  }
  unfold(): Self {
    return this.push("Unfold");
  }
  path(): Self {
    return this.push("Path");
  }
  simplePath(): Self {
    return this.push("SimplePath");
  }
  withSack(initial: PropertyValueInput): Self {
    return this.push({ WithSack: encodePropertyValue(initial) });
  }
  sackSet(prop: string): Self {
    return this.push({ SackSet: prop });
  }
  sackAdd(prop: string): Self {
    return this.push({ SackAdd: prop });
  }
  sackGet(): Self {
    return this.push("SackGet");
  }
}

export class SubTraversal extends Steps<SubTraversal> {
  protected push(step: JsonValue): SubTraversal {
    const next = new SubTraversal();
    next.steps = [...this.steps, step];
    return next;
  }
  encode(): JsonValue {
    return { steps: this.steps.slice() };
  }
}

export class Traversal extends Steps<Traversal> {
  mode: "read" | "write" = "read";

  protected push(step: JsonValue): Traversal {
    const next = new Traversal();
    next.steps = [...this.steps, step];
    next.mode = this.mode;
    return next;
  }
  private pushWrite(step: JsonValue): Traversal {
    const next = this.push(step);
    next.mode = "write";
    return next;
  }

  n(nodes: JsonValue | string | NodeId | NodeId[] = "All"): Traversal {
    return this.push({ N: asNodeRef(nodes) });
  }
  nWhere(predicate: Predicate): Traversal {
    return this.push({ NWhere: predicate.node });
  }
  nWithLabel(label: string): Traversal {
    return this.nWhere(SourcePredicate.eq("$label", label));
  }
  nWithLabelWhere(label: string, predicate: Predicate): Traversal {
    return this.nWhere(
      SourcePredicate.and([SourcePredicate.eq("$label", label), predicate]),
    );
  }
  e(edges: JsonValue | NodeId | NodeId[]): Traversal {
    return this.push({ E: asNodeRef(edges) });
  }
  eWhere(predicate: Predicate): Traversal {
    return this.push({ EWhere: predicate.node });
  }
  eWithLabel(label: string): Traversal {
    return this.eWhere(SourcePredicate.eq("$label", label));
  }
  inject(name: string): Traversal {
    return this.push({ Inject: name });
  }

  vectorSearchNodes(
    label: string,
    property: string,
    queryVector: number[] | Expr | ParamRef,
    k: number | Expr | ParamRef,
    tenantValue: ExprLike | null = null,
  ): Traversal {
    const query = Array.isArray(queryVector)
      ? { Value: { F32Array: queryVector as JsonValue } }
      : asInput(queryVector);
    const fields: { [key: string]: JsonValue } = { label, property };
    if (tenantValue !== null) fields.tenant_value = asInput(tenantValue);
    fields.query_vector = query;
    fields.k = asBound(k);
    return this.push({ VectorSearchNodes: fields });
  }
  textSearchNodes(
    label: string,
    property: string,
    queryText: ExprLike,
    k: number | Expr | ParamRef,
    tenantValue: ExprLike | null = null,
  ): Traversal {
    const fields: { [key: string]: JsonValue } = { label, property };
    if (tenantValue !== null) fields.tenant_value = asInput(tenantValue);
    fields.query_text = asInput(queryText);
    fields.k = asBound(k);
    return this.push({ TextSearchNodes: fields });
  }
  vectorSearchEdges(
    label: string,
    property: string,
    queryVector: number[] | Expr | ParamRef,
    k: number | Expr | ParamRef,
    tenantValue: ExprLike | null = null,
  ): Traversal {
    const query = Array.isArray(queryVector)
      ? { Value: { F32Array: queryVector as JsonValue } }
      : asInput(queryVector);
    const fields: { [key: string]: JsonValue } = { label, property };
    if (tenantValue !== null) fields.tenant_value = asInput(tenantValue);
    fields.query_vector = query;
    fields.k = asBound(k);
    return this.push({ VectorSearchEdges: fields });
  }
  textSearchEdges(
    label: string,
    property: string,
    queryText: ExprLike,
    k: number | Expr | ParamRef,
    tenantValue: ExprLike | null = null,
  ): Traversal {
    const fields: { [key: string]: JsonValue } = { label, property };
    if (tenantValue !== null) fields.tenant_value = asInput(tenantValue);
    fields.query_text = asInput(queryText);
    fields.k = asBound(k);
    return this.push({ TextSearchEdges: fields });
  }

  count(): Traversal {
    return this.push("Count");
  }
  exists(): Traversal {
    return this.push("Exists");
  }
  id(): Traversal {
    return this.push("Id");
  }
  label(): Traversal {
    return this.push("Label");
  }
  values(properties: string[]): Traversal {
    return this.push({ Values: properties as JsonValue });
  }
  valueMap(properties: string[] | null = null): Traversal {
    return this.push({ ValueMap: properties as JsonValue });
  }
  project(projections: JsonValue[]): Traversal {
    return this.push({ Project: projections });
  }
  projectBindings(projections: JsonValue[], distinct = false): Traversal {
    return this.push({ ProjectBindings: { projections, distinct } });
  }
  edgeProperties(): Traversal {
    return this.push("EdgeProperties");
  }
  group(prop: string): Traversal {
    return this.push({ Group: prop });
  }
  groupCount(prop: string): Traversal {
    return this.push({ GroupCount: prop });
  }
  aggregateBy(fn: "Count" | "Sum" | "Min" | "Max" | "Mean", prop: string): Traversal {
    return this.push({ AggregateBy: [fn, prop] });
  }

  repeat(config: RepeatConfig): Traversal {
    return this.push({ Repeat: config.encode() });
  }
  union(traversals: SubTraversal[]): Traversal {
    return this.push({ Union: traversals.map((t) => t.encode()) });
  }
  choose(
    condition: Predicate,
    thenTraversal: SubTraversal,
    elseTraversal: SubTraversal | null = null,
  ): Traversal {
    return this.push({
      Choose: {
        condition: condition.node,
        then_traversal: thenTraversal.encode(),
        else_traversal: elseTraversal === null ? null : elseTraversal.encode(),
      },
    });
  }
  coalesce(traversals: SubTraversal[]): Traversal {
    return this.push({ Coalesce: traversals.map((t) => t.encode()) });
  }
  optional(traversal: SubTraversal): Traversal {
    return this.push({ Optional: traversal.encode() });
  }

  createIndexIfNotExists(spec: JsonValue): Traversal {
    return this.pushWrite({ CreateIndex: { spec, if_not_exists: true } });
  }
  dropIndex(spec: JsonValue): Traversal {
    return this.pushWrite({ DropIndex: { spec } });
  }
  createVectorIndexNodes(label: string, property: string, tenantProperty?: string): Traversal {
    return this.createIndexIfNotExists(
      IndexSpec.nodeVector(label, property, tenantProperty),
    );
  }
  createVectorIndexEdges(label: string, property: string, tenantProperty?: string): Traversal {
    return this.createIndexIfNotExists(
      IndexSpec.edgeVector(label, property, tenantProperty),
    );
  }
  createTextIndexNodes(label: string, property: string, tenantProperty?: string): Traversal {
    return this.createIndexIfNotExists(
      IndexSpec.nodeText(label, property, tenantProperty),
    );
  }
  createTextIndexEdges(label: string, property: string, tenantProperty?: string): Traversal {
    return this.createIndexIfNotExists(
      IndexSpec.edgeText(label, property, tenantProperty),
    );
  }

  addN(label: string, properties?: PropEntries): Traversal {
    return this.pushWrite({ AddN: { label, properties: propEntries(properties) } });
  }
  addE(
    label: string,
    to: JsonValue | string | NodeId | NodeId[],
    properties?: PropEntries,
  ): Traversal {
    return this.pushWrite({
      AddE: { label, to: asNodeRef(to), properties: propEntries(properties) },
    });
  }
  setProperty(name: string, value: ExprLike): Traversal {
    return this.pushWrite({ SetProperty: [name, asInput(value)] });
  }
  removeProperty(name: string): Traversal {
    return this.pushWrite({ RemoveProperty: name });
  }
  drop(): Traversal {
    return this.pushWrite("Drop");
  }
  dropEdge(to: JsonValue | string | NodeId | NodeId[]): Traversal {
    return this.pushWrite({ DropEdge: asNodeRef(to) });
  }
  dropEdgeLabeled(to: JsonValue | string | NodeId | NodeId[], label: string): Traversal {
    return this.pushWrite({ DropEdgeLabeled: { to: asNodeRef(to), label } });
  }
  dropEdgeById(edges: JsonValue | NodeId | NodeId[]): Traversal {
    return this.pushWrite({ DropEdgeById: asNodeRef(edges) });
  }
}

/**
 * Start a typestate-checked traversal (the default entry point —
 * invalid chains are compile errors; see TraversalView below).
 */
export function g(): TraversalView<"start", "read"> {
  return new Traversal() as unknown as TraversalView<"start", "read">;
}

/** Start an unchecked traversal (dynamic step assembly). */
export function gUnchecked(): Traversal {
  return new Traversal();
}

export function sub(): SubTraversal {
  return new SubTraversal();
}

// ---------------------------------------------------------------------------
// Batches / envelope
// ---------------------------------------------------------------------------

export const BatchCondition = {
  varNotEmpty: (name: string): JsonValue => ({ VarNotEmpty: name }),
  varEmpty: (name: string): JsonValue => ({ VarEmpty: name }),
  varMinSize: (name: string, size: number): JsonValue => ({
    VarMinSize: [name, size],
  }),
  prevNotEmpty: "PrevNotEmpty" as JsonValue,
};

abstract class Batch<Self extends Batch<Self>> {
  queries: JsonValue[] = [];
  returns: string[] = [];
  abstract readonly kind: "read" | "write";

  protected abstract make(): Self;
  protected checkMode(_traversal: Traversal): void {}

  private with(queries: JsonValue[], returns: string[]): Self {
    const next = this.make();
    next.queries = queries;
    next.returns = returns;
    return next;
  }

  varAs(name: string, traversal: Traversal | AnyTraversalView): Self {
    this.checkMode(traversal as Traversal);
    return this.with(
      [
        ...this.queries,
        { Query: { name, steps: traversal.steps.slice(), condition: null } },
      ],
      this.returns,
    );
  }
  varAsIf(name: string, condition: JsonValue, traversal: Traversal | AnyTraversalView): Self {
    this.checkMode(traversal as Traversal);
    return this.with(
      [...this.queries, { Query: { name, steps: traversal.steps.slice(), condition } }],
      this.returns,
    );
  }
  forEachParam(paramName: string, body: Batch<Self>): Self {
    return this.with(
      [...this.queries, { ForEach: { param: paramName, body: body.queries.slice() } }],
      this.returns,
    );
  }
  returning(vars: string[]): Self {
    return this.with(this.queries.slice(), vars.slice());
  }

  encode(): JsonValue {
    return { queries: this.queries.slice(), returns: this.returns.slice() };
  }
  toJsonString(): string {
    return stringifyJson(this.encode());
  }
  toDynamicRequest(
    params?: DefinedParams,
    values?: { [key: string]: unknown },
    queryName: string | null = null,
  ): DynamicQueryRequest {
    const request = new DynamicQueryRequest(this.kind, this.encode(), queryName);
    if (!params) {
      if (values) {
        throw new Error("dynamic parameter values require a parameter schema");
      }
      return request;
    }
    if (!values) {
      throw new Error(
        "dynamic parameter values are required when a parameter schema is provided",
      );
    }
    for (const key of Object.keys(values)) {
      if (!(key in params.schema)) throw new Error(`unknown parameter: ${key}`);
    }
    for (const [name, schema] of Object.entries(params.schema)) {
      if (!(name in values)) {
        throw new Error(`missing required parameter: ${name}`);
      }
      request.parameterTypes[name] = schema.encodeType();
      request.parameters[name] = schema.convert(values[name], name);
    }
    return request;
  }
  toDynamicJson(
    params?: DefinedParams,
    values?: { [key: string]: unknown },
    queryName: string | null = null,
  ): string {
    return this.toDynamicRequest(params, values, queryName).toJsonString();
  }
}

export class ReadBatch extends Batch<ReadBatch> {
  readonly kind = "read" as const;
  protected make(): ReadBatch {
    return new ReadBatch();
  }
  protected checkMode(traversal: Traversal): void {
    if (traversal.mode !== "read") {
      throw new Error("ReadBatch only accepts read-only traversals");
    }
  }
  // typestate: only read-mode traversals are accepted at compile time
  // (runtime checkMode stays as the dynamic net); method bivariance
  // allows the narrowed parameter type
  varAs(name: string, traversal: Traversal | ReadOnlyTraversal): ReadBatch {
    return super.varAs(name, traversal as Traversal);
  }
  varAsIf(
    name: string,
    condition: JsonValue,
    traversal: Traversal | ReadOnlyTraversal,
  ): ReadBatch {
    return super.varAsIf(name, condition, traversal as Traversal);
  }
}

export class WriteBatch extends Batch<WriteBatch> {
  readonly kind = "write" as const;
  protected make(): WriteBatch {
    return new WriteBatch();
  }
}

export function readBatch(): ReadBatch {
  return new ReadBatch();
}

export function writeBatch(): WriteBatch {
  return new WriteBatch();
}

export class DynamicQueryRequest {
  parameters: { [key: string]: JsonValue } = {};
  parameterTypes: { [key: string]: JsonValue } = {};

  constructor(
    public requestType: "read" | "write",
    public query: JsonValue,
    public queryName: string | null = null,
  ) {}

  static read(query: ReadBatch, queryName: string | null = null): DynamicQueryRequest {
    return new DynamicQueryRequest("read", query.encode(), queryName);
  }
  static write(query: WriteBatch, queryName: string | null = null): DynamicQueryRequest {
    return new DynamicQueryRequest("write", query.encode(), queryName);
  }

  withParameterValue(name: string, value: JsonValue): this {
    this.parameters[name] = value;
    return this;
  }
  withParameterType(name: string, ty: JsonValue): this {
    this.parameterTypes[name] = ty;
    return this;
  }
  withQueryName(name: string | null): this {
    this.queryName = name;
    return this;
  }

  encode(): JsonValue {
    const out: { [key: string]: JsonValue } = {
      request_type: this.requestType,
      query_name: this.queryName,
      query: this.query,
    };
    if (Object.keys(this.parameters).length) out.parameters = this.parameters;
    if (Object.keys(this.parameterTypes).length) {
      out.parameter_types = this.parameterTypes;
    }
    return out;
  }
  toJsonString(): string {
    return stringifyJson(this.encode());
  }
  toDynamicJson(): string {
    return this.toJsonString();
  }
}

// ---------------------------------------------------------------------------
// Parameters
// ---------------------------------------------------------------------------

export class ParamSchema {
  constructor(
    readonly kind: string,
    readonly inner: ParamSchema | null = null,
    readonly objectInner: ParamSchema | null = null,
  ) {}

  encodeType(): JsonValue {
    if (this.kind === "Array") {
      return { Array: (this.inner as ParamSchema).encodeType() };
    }
    return this.kind;
  }

  convert(value: unknown, path: string): JsonValue {
    switch (this.kind) {
      case "Bool":
        if (typeof value !== "boolean") {
          throw new Error(`parameter '${path}' must be boolean`);
        }
        return value;
      case "I64":
        if (typeof value !== "number" && typeof value !== "bigint") {
          throw new Error(`parameter '${path}' must be an integer`);
        }
        return value as JsonValue;
      case "F64":
      case "F32":
        if (typeof value !== "number") {
          throw new Error(`parameter '${path}' must be a number`);
        }
        return value;
      case "String":
        if (typeof value !== "string") {
          throw new Error(`parameter '${path}' must be string`);
        }
        return value;
      case "DateTime": {
        const millis =
          value instanceof Date
            ? value.getTime()
            : typeof value === "string"
              ? Date.parse(value)
              : (value as number);
        const iso = new Date(millis).toISOString();
        return iso.replace(/(\.\d{3})\d*Z$/, "$1Z");
      }
      case "Bytes":
        throw new Error(
          `parameter '${path}' uses bytes, which the dynamic query JSON route cannot represent`,
        );
      case "Value":
        return flattenDynamic(
          encodePropertyValue(value as PropertyValueInput),
          path,
        );
      case "Object": {
        if (typeof value !== "object" || value === null || Array.isArray(value)) {
          throw new Error(`parameter '${path}' must be object`);
        }
        const inner = this.objectInner ?? new ParamSchema("Value");
        const out: { [key: string]: JsonValue } = {};
        for (const [k, v] of Object.entries(value)) {
          out[k] = inner.convert(v, `${path}.${k}`);
        }
        return out;
      }
      case "Array": {
        if (!Array.isArray(value)) {
          throw new Error(`parameter '${path}' must be array`);
        }
        return value.map((v, i) =>
          (this.inner as ParamSchema).convert(v, `${path}[${i}]`),
        );
      }
      default:
        throw new Error(`unknown parameter schema: ${this.kind}`);
    }
  }
}

function flattenDynamic(encoded: JsonValue, path: string): JsonValue {
  if (encoded === "Null") return null;
  const [tag, body] = Object.entries(encoded as object)[0] as [string, JsonValue];
  switch (tag) {
    case "Bool":
    case "I64":
    case "F64":
    case "F32":
    case "String":
    case "I64Array":
    case "F64Array":
    case "F32Array":
    case "StringArray":
      return body;
    case "DateTime":
      return new Date(body as number)
        .toISOString()
        .replace(/(\.\d{3})\d*Z$/, "$1Z");
    case "Bytes":
      throw new Error(
        `parameter '${path}' uses bytes, which the dynamic query JSON route cannot represent`,
      );
    case "Array":
      return (body as JsonValue[]).map((v, i) =>
        flattenDynamic(v, `${path}[${i}]`),
      );
    case "Object": {
      const out: { [key: string]: JsonValue } = {};
      for (const [k, v] of Object.entries(body as object)) {
        out[k] = flattenDynamic(v as JsonValue, `${path}.${k}`);
      }
      return out;
    }
    default:
      throw new Error(`unsupported property value variant: ${tag}`);
  }
}

export class ParamRef {
  constructor(
    readonly name: string,
    readonly schema: ParamSchema,
  ) {}
  toExpr(): Expr {
    return Expr.param(this.name);
  }
  input(): JsonValue {
    return { Expr: { Param: this.name } };
  }
  bound(): JsonValue {
    return { Expr: { Param: this.name } };
  }
}

export const param = {
  bool: () => new ParamSchema("Bool"),
  i64: () => new ParamSchema("I64"),
  f64: () => new ParamSchema("F64"),
  f32: () => new ParamSchema("F32"),
  string: () => new ParamSchema("String"),
  dateTime: () => new ParamSchema("DateTime"),
  bytes: () => new ParamSchema("Bytes"),
  value: () => new ParamSchema("Value"),
  object: (inner?: ParamSchema) =>
    new ParamSchema("Object", null, inner ?? new ParamSchema("Value")),
  array: (inner: ParamSchema) => new ParamSchema("Array", inner),
};

export class DefinedParams {
  readonly refs: { [key: string]: ParamRef } = {};

  constructor(readonly schema: { [key: string]: ParamSchema }) {
    for (const [name, s] of Object.entries(schema)) {
      this.refs[name] = new ParamRef(name, s);
      // Convenience: params.myParam access like the reference SDK.
      (this as unknown as { [key: string]: ParamRef })[name] = this.refs[name];
    }
  }
}

export function defineParams(schema: {
  [key: string]: ParamSchema;
}): DefinedParams & { [key: string]: ParamRef } {
  return new DefinedParams(schema) as DefinedParams & { [key: string]: ParamRef };
}

// ---------------------------------------------------------------------------
// Stored-query bundles (wire v5)
// ---------------------------------------------------------------------------

export const QUERY_BUNDLE_VERSION = 5;

export interface RegisteredQuery {
  kind: "read" | "write";
  params: DefinedParams;
  build: (p: DefinedParams & { [key: string]: ParamRef }) => ReadBatch | WriteBatch;
}

export function registerRead(
  build: (p: DefinedParams & { [key: string]: ParamRef }) => ReadBatch,
  params: DefinedParams,
): RegisteredQuery {
  return { kind: "read", params, build };
}

export function registerWrite(
  build: (p: DefinedParams & { [key: string]: ParamRef }) => WriteBatch,
  params: DefinedParams,
): RegisteredQuery {
  return { kind: "write", params, build };
}

export function buildQueryBundle(definitions: {
  read?: { [name: string]: RegisteredQuery };
  write?: { [name: string]: RegisteredQuery };
}): JsonValue {
  const reads = definitions.read ?? {};
  const writes = definitions.write ?? {};
  for (const name of Object.keys(reads)) {
    if (name in writes) throw new Error(`duplicate generated query name: ${name}`);
  }
  const routes = (table: { [name: string]: RegisteredQuery }) => {
    const out: { [key: string]: JsonValue } = {};
    for (const name of Object.keys(table).sort()) {
      const route = table[name];
      out[name] = route
        .build(route.params as DefinedParams & { [key: string]: ParamRef })
        .encode();
    }
    return out;
  };
  const parameters = (table: { [name: string]: RegisteredQuery }) => {
    const out: { [key: string]: JsonValue } = {};
    for (const name of Object.keys(table).sort()) {
      out[name] = Object.entries(table[name].params.schema).map(
        ([pname, schema]) => ({ name: pname, ty: schema.encodeType() }),
      );
    }
    return out;
  };
  return {
    version: QUERY_BUNDLE_VERSION,
    read_routes: routes(reads),
    write_routes: routes(writes),
    read_parameters: parameters(reads),
    write_parameters: parameters(writes),
  };
}

// ---------------------------------------------------------------------------
// Type-level typestate (reference `Traversal<S, M>`, dsl.ts:1382)
//
// The runtime Traversal class stays permissive (plain-JS users, dynamic
// chains); the typed view below is what `g()` returns, so invalid chains
// — `outN()` on a node stream, steps after a terminal, a mutation inside
// a read batch — are COMPILE errors for TypeScript users.  The phantom
// `__stream`/`__mode` fields never exist at runtime.
// ---------------------------------------------------------------------------

export type StreamState = "start" | "nodes" | "edges" | "done";
export type ModeState = "read" | "write";

type TV<S extends StreamState, M extends ModeState> = TraversalView<S, M>;

/** Steps available on both live element streams. */
interface LiveSteps<S extends "nodes" | "edges", M extends ModeState> {
  has(prop: string, value: PropertyValueInput): TV<S, M>;
  hasLabel(label: string): TV<S, M>;
  hasKey(prop: string): TV<S, M>;
  where(predicate: Predicate): TV<S, M>;
  dedup(): TV<S, M>;
  within(name: string): TV<S, M>;
  without(name: string): TV<S, M>;
  limit(n: ExprLike | number): TV<S, M>;
  skip(n: ExprLike | number): TV<S, M>;
  range(start: ExprLike | number, end: ExprLike | number): TV<S, M>;
  orderBy(prop: string, order?: Order): TV<S, M>;
  orderByMultiple(orderings: [string, Order][]): TV<S, M>;
  as_(name: string): TV<S, M>;
  store(name: string): TV<S, M>;
  select(name: string): TV<S, M>;
  bind(name: string): TV<S, M>;
  repeat(config: RepeatConfig): TV<S, M>;
  union(traversals: SubTraversal[]): TV<S, M>;
  choose(condition: Predicate, then: SubTraversal, else_?: SubTraversal): TV<S, M>;
  coalesce(traversals: SubTraversal[]): TV<S, M>;
  optional(traversal: SubTraversal): TV<S, M>;
  fold(): TV<S, M>;
  unfold(): TV<S, M>;
  path(): TV<S, M>;
  simplePath(): TV<S, M>;
  withSack(initial: PropertyValueInput): TV<S, M>;
  sackSet(prop: string): TV<S, M>;
  sackAdd(prop: string): TV<S, M>;
  sackGet(): TV<S, M>;
  count(): TV<"done", M>;
  exists(): TV<"done", M>;
  id(): TV<"done", M>;
  label(): TV<"done", M>;
  values(properties: string[]): TV<"done", M>;
  valueMap(properties?: string[] | null): TV<"done", M>;
  project(projections: JsonValue[]): TV<"done", M>;
  projectBindings(projections: JsonValue[], distinct?: boolean): TV<"done", M>;
  group(prop: string): TV<"done", M>;
  groupCount(prop: string): TV<"done", M>;
  aggregateBy(fn: "Count" | "Sum" | "Min" | "Max" | "Mean", prop: string): TV<"done", M>;
  setProperty(name: string, value: ExprLike): TV<S, "write">;
  removeProperty(name: string): TV<S, "write">;
  drop(): TV<"done", "write">;
}

/** Steps that only make sense before any source step. */
interface StartSteps<M extends ModeState> {
  n(nodes?: JsonValue | string | NodeId | NodeId[]): TV<"nodes", M>;
  nWhere(predicate: Predicate): TV<"nodes", M>;
  nWithLabel(label: string): TV<"nodes", M>;
  nWithLabelWhere(label: string, predicate: Predicate): TV<"nodes", M>;
  e(edges: JsonValue | NodeId | NodeId[]): TV<"edges", M>;
  eWhere(predicate: Predicate): TV<"edges", M>;
  eWithLabel(label: string): TV<"edges", M>;
  inject(name: string): TV<"nodes", M>;
  vectorSearchNodes(
    label: string,
    property: string,
    queryVector: number[] | Expr | ParamRef,
    k: number | Expr | ParamRef,
    tenantValue?: PropertyValueInput | Expr | ParamRef,
  ): TV<"nodes", M>;
  textSearchNodes(
    label: string,
    property: string,
    queryText: string | Expr | ParamRef,
    k: number | Expr | ParamRef,
    tenantValue?: PropertyValueInput | Expr | ParamRef,
  ): TV<"nodes", M>;
  vectorSearchEdges(
    label: string,
    property: string,
    queryVector: number[] | Expr | ParamRef,
    k: number | Expr | ParamRef,
    tenantValue?: PropertyValueInput | Expr | ParamRef,
  ): TV<"edges", M>;
  textSearchEdges(
    label: string,
    property: string,
    queryText: string | Expr | ParamRef,
    k: number | Expr | ParamRef,
    tenantValue?: PropertyValueInput | Expr | ParamRef,
  ): TV<"edges", M>;
  createIndexIfNotExists(spec: JsonValue): TV<"done", "write">;
  dropIndex(spec: JsonValue): TV<"done", "write">;
  createVectorIndexNodes(label: string, property: string, tenantProperty?: string): TV<"done", "write">;
  createVectorIndexEdges(label: string, property: string, tenantProperty?: string): TV<"done", "write">;
  createTextIndexNodes(label: string, property: string, tenantProperty?: string): TV<"done", "write">;
  createTextIndexEdges(label: string, property: string, tenantProperty?: string): TV<"done", "write">;
  addN(label: string, properties?: PropEntries): TV<"nodes", "write">;
}

/** Node-stream-only steps. */
interface NodeSteps<M extends ModeState> {
  out(label?: string | null): TV<"nodes", M>;
  in_(label?: string | null): TV<"nodes", M>;
  both(label?: string | null): TV<"nodes", M>;
  outE(label?: string | null): TV<"edges", M>;
  inE(label?: string | null): TV<"edges", M>;
  bothE(label?: string | null): TV<"edges", M>;
  addE(
    label: string,
    to: JsonValue | string | NodeId | NodeId[],
    properties?: PropEntries,
  ): TV<"nodes", "write">;
  dropEdge(to: JsonValue | string | NodeId | NodeId[]): TV<"nodes", "write">;
  dropEdgeLabeled(to: JsonValue | string | NodeId | NodeId[], label: string): TV<"nodes", "write">;
  dropEdgeById(edges: JsonValue | NodeId | NodeId[]): TV<"nodes", "write">;
}

/** Edge-stream-only steps. */
interface EdgeSteps<M extends ModeState> {
  outN(): TV<"nodes", M>;
  inN(): TV<"nodes", M>;
  otherN(): TV<"nodes", M>;
  edgeHas(prop: string, value: ExprLike): TV<"edges", M>;
  edgeHasLabel(label: string): TV<"edges", M>;
  edgeProperties(): TV<"done", M>;
}

interface ViewCommon<S extends StreamState, M extends ModeState> {
  readonly __stream?: S;
  readonly __mode?: M;
  readonly steps: JsonValue[];
  readonly mode: "read" | "write";
}

/** The typestate view over the runtime Traversal class. */
export type TraversalView<S extends StreamState, M extends ModeState> =
  ViewCommon<S, M> &
  (S extends "start" ? StartSteps<M> : unknown) &
  (S extends "nodes" ? NodeSteps<M> & LiveSteps<"nodes", M> : unknown) &
  (S extends "edges" ? EdgeSteps<M> & LiveSteps<"edges", M> : unknown);

/** Any traversal whose mode is still read-only (accepted by ReadBatch). */
export type ReadOnlyTraversal = ViewCommon<StreamState, "read">;

/** Structural shape every traversal view satisfies (batch assembly). */
export type AnyTraversalView = ViewCommon<StreamState, ModeState>;
